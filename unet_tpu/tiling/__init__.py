from .windows import Window, generate_windows  # noqa: F401
from .split import align_image_and_mask, create_train_test_split, split_raster  # noqa: F401
