"""unet_tpu — a TPU-native aerial-image semantic-segmentation framework.

From-scratch rebuild of the capabilities of LUP-LuftbildUmweltPlanung/UNet
(GeoTIFF tiling → U-Net training → sliding-window prediction → georeferenced
mosaic) designed for JAX/XLA on TPU: Flax models in NHWC bf16, pjit/shard_map
data parallelism over a device mesh, on-device batch augmentation, batched
overlap-blended inference, and orbax checkpointing.
"""

__version__ = "0.1.0"
