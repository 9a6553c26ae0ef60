from . import losses, metrics, schedule  # noqa: F401
from .loop import Trainer, TrainerConfig, TrainState, train_model  # noqa: F401
from .checkpoint import export_bundle, load_bundle, load_weights, save_weights  # noqa: F401
from .optimizer import one_cycle_adam, constant_lr_adam, fastai_adam, label_params  # noqa: F401
