from .predict import Predictor, predict_raster, save_predictions  # noqa: F401
from .merge import MosaicAccumulator, TileInfo, tile_extent_info  # noqa: F401
from .figures import plot_valid_predict  # noqa: F401
