"""XResNet encoder bodies (Bag-of-Tricks ResNets), re-derived for TPU.

The reference uses fastai's ``xresnet{18,34,50,101,34_deep}`` as the U-Net
encoder after cutting the classification head and swapping the first conv
for an N-input-channel one (train.py:126-135). Here the N-channel stem is
simply a constructor argument, and the encoder returns its skip activations
explicitly — the static-shape replacement for fastai's runtime forward-hook
mechanism (DynamicUnet hooks children [conv3, stage1..stageN-1]; SURVEY.md
"hard parts").
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvLayer, ResBlock, depth_to_space_mxu,
                     max_pool_torch)

# architecture name -> (expansion, blocks per stage)
ARCHS: Dict[str, Tuple[int, Tuple[int, ...]]] = {
    "xresnet18": (1, (2, 2, 2, 2)),
    "xresnet34": (1, (3, 4, 6, 3)),
    "xresnet50": (4, (3, 4, 6, 3)),
    "xresnet101": (4, (3, 4, 23, 3)),
    "xresnet34_deep": (1, (3, 4, 6, 3, 1, 1)),
}


def stage_widths(n_stages: int) -> List[int]:
    """fastai block_szs: [64, 128, 256, 512] then 256 for deeper stages."""
    base = [64, 128, 256, 512]
    return base[:n_stages] + [256] * max(0, n_stages - 4)


class XResNetBody(nn.Module):
    """Encoder body: 3-conv stem + maxpool + residual stages.

    ``__call__`` returns ``(features, skips)`` where ``skips`` are the
    activations the decoder consumes, deepest-first: [stage_{N-1}, ...,
    stage_1, stem_conv3] — i.e. the last activation at each resolution
    before further downsampling, exactly the layers fastai's
    ``_get_sz_change_idxs`` hooks (children [6,5,4,2] for 4-stage nets).
    """

    arch: str = "xresnet34"
    c_in: int = 3
    dtype: Any = jnp.bfloat16
    remat: bool = False  # rematerialize blocks: trade FLOPs for activation HBM
    # Folded stem (space-to-depth, the MLPerf ResNet trick taken to /4): the
    # parity stem's three 32/64-channel convs at /2 resolution use ≤25% of
    # the MXU's 128 lanes and their wgrads contract a huge spatial extent
    # into a tiny kernel (measured 12 ms of the bs16 step at <25 TF/s).
    # Instead fold 4×4 spatial into channels and run the whole stem at /4
    # with 128/128/256 channels (logical 32/32/64 per 2×2 output phase) —
    # folded k3 covers a strict superset of each parity conv's receptive
    # field, and every conv is lane-aligned. The skip tensor unfolds back to
    # 64 channels at /2 via depth_to_space. Changes parameter shapes:
    # opt-in via tpu_opt; quality-gated in tests/test_pipeline_e2e.py.
    tpu_opt: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, List[jax.Array]]:
        expansion, layers = ARCHS[self.arch]
        widths = stage_widths(len(layers))
        block_cls = nn.remat(ResBlock, static_argnums=(2,)) if self.remat else ResBlock

        # Stem: ConvLayer(c_in,32,stride2) → (32,32) → (32,64), then maxpool.
        # The reference's "multispectral swap" of body[0][0] (train.py:130-135)
        # is just c_in here.
        if self.tpu_opt and (x.shape[1] % 4 or x.shape[2] % 4):
            # the folded stem is a STATIC property of the config, never a
            # traced-shape fallback: silently building the parity stem here
            # would make parameter structure input-shape-dependent (a bundle
            # trained at 512 would fail on a 402-wide tile with a raw flax
            # shape error, and a manifest could stamp tpu_opt topology while
            # holding parity-stem weights)
            raise ValueError(
                f"tpu_opt requires tile height/width divisible by 4, got "
                f"{x.shape[1]}x{x.shape[2]}; pad the tile or set tpu_opt=False")
        if self.tpu_opt:
            # k4-s4 conv ≡ a 1×1 conv on space-to-depth(4) input but with the
            # fold fused into the conv's input read — the explicit s2d
            # transpose on the lane-starved (B,H,W,3) layout traced at
            # ~30 GB/s (≈2.6 ms f+b at bs16·512²) and the first layer needs
            # no input gradient, so the small-C wgrad is the only backward
            x = ConvLayer(128, 4, 4, pad=((0, 0), (0, 0)), dtype=self.dtype,
                          name="stem_0")(x, train)
            x = ConvLayer(128, 3, 1, dtype=self.dtype, name="stem_1")(x, train)
            x = ConvLayer(256, 3, 1, dtype=self.dtype, name="stem_2")(x, train)
            stem_out = depth_to_space_mxu(x, 2)  # skip at /2, 64 channels
            # (a reshape-max 2×2 pool was tried here: its equality-mask
            # backward traced SLOWER than k3's select_and_scatter — keep the
            # parity pool)
            x = max_pool_torch(stem_out, 3, 2)
        else:
            x = ConvLayer(32, 3, 2, dtype=self.dtype, name="stem_0")(x, train)
            x = ConvLayer(32, 3, 1, dtype=self.dtype, name="stem_1")(x, train)
            x = ConvLayer(64, 3, 1, dtype=self.dtype, name="stem_2")(x, train)
            stem_out = x  # skip at /2
            x = max_pool_torch(stem_out, 3, 2)

        stage_outs: List[jax.Array] = []
        for s, (n_blocks, width) in enumerate(zip(layers, widths)):
            stride = 1 if s == 0 else 2
            for b in range(n_blocks):
                x = block_cls(
                    expansion,
                    width,
                    stride=stride if b == 0 else 1,
                    dtype=self.dtype,
                    name=f"stage_{s}_block_{b}",
                )(x, train)
            stage_outs.append(x)

        # skips: every stage output except the deepest, reversed, then stem.
        skips = list(reversed(stage_outs[:-1])) + [stem_out]
        return x, skips


def encoder_out_channels(arch: str) -> int:
    expansion, layers = ARCHS[arch]
    return stage_widths(len(layers))[len(layers) - 1] * expansion
