from .xresnet import ARCHS, XResNetBody, encoder_out_channels  # noqa: F401
from .unet import DynamicUnet, UnetBlock, build_unet  # noqa: F401
from . import layers  # noqa: F401
