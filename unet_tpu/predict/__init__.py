from .predict import (Predictor, predict_raster, predict_raster_streamed,  # noqa: F401
                      save_predictions, serve_scenes)
from .artifact import (ArtifactPredictor, export_artifact, is_artifact,  # noqa: F401
                       load_artifact)
from .merge import MosaicAccumulator, TileInfo, tile_extent_info  # noqa: F401
from .figures import plot_valid_predict  # noqa: F401
