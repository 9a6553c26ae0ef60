"""DynamicUnet re-derived as a static Flax module.

The reference delegates its entire decoder topology to fastai's hook-driven
``DynamicUnet`` (train.py:141-144, called with ``blur=True, blur_final=True,
self_attention=<flag>, last_cross=True, bottle=False``). fastai sizes the
decoder at runtime by dummy-forwarding the encoder; here the topology is
derived statically from the architecture table — the XLA-friendly design
(static shapes, traced once).

Faithfully reproduced details:
* skip set = last activation per resolution (xresnet children [6,5,4,2])
* middle: BatchNorm → ReLU → ConvLayer(ni→2ni) → ConvLayer(2ni→ni)
* UnetBlock: PixelShuffle-ICNR(up_in→up_in/2, blur) ‖ BatchNorm(skip) →
  ReLU(concat) → ConvLayer(ni→nf) → ConvLayer(nf→nf [+ self-attention]),
  nf = ni except ni/2 in the final block (``final_div=not_final``)
* self-attention sits in the third-from-last UnetBlock (i == n-3)
* trailing PixelShuffle-ICNR (no blur) back to full res, nearest-resize to
  the input grid, last_cross dense-merge with the raw input, ResBlock, and a
  1x1 head to ``n_out``
* the reference passes the NormType *class* as norm_type, which disables
  normalization inside every decoder ConvLayer/ResBlock and enables conv
  bias; only the explicit BatchNorms above remain. Reproduced via
  ``decoder_norm=None`` (configurable for a clean mode).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvLayer, ConvTransposeUp, PixelShuffleICNR, ResBlock,
                     SelfAttention, batch_norm, pixel_shuffle,
                     space_to_depth_mxu)
from .xresnet import ARCHS, XResNetBody


# bumped whenever a tpu_opt structural change alters parameter shapes
# (folded stem / conv-transpose upsample / slim decoder = v2; single-conv
# final block = v3); bundles record it so a topology mismatch fails with a
# clear message instead of a weight-shape error (train/checkpoint.py)
TPU_OPT_TOPOLOGY_VERSION = 3


class UnetBlock(nn.Module):
    """One decoder stage: upsample, fuse skip, refine."""

    final_div: bool
    blur: bool
    self_attention: bool = False
    norm: Optional[str] = None
    convt_up: bool = False  # tpu_opt: k2-s2 transposed conv instead of
    # 1×1conv+PixelShuffle — same function class and ICNR-equivalent init,
    # but no materialized 6-D transpose (layers.ConvTransposeUp)
    up_nf: Optional[int] = None  # override upsample output channels
    nf_out: Optional[int] = None  # override conv1/conv2 output channels
    single_conv: bool = False  # drop conv2 (tpu_opt final block: its output
    # feeds straight into the last_cross ResBlock's two convs at the same
    # resolution, so one of four consecutive 3×3 convs goes)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, up_in: jax.Array, skip: jax.Array, train: bool = False) -> jax.Array:
        up_c = up_in.shape[-1]
        u_nf = self.up_nf or up_c // 2
        if self.convt_up:
            up_out = ConvTransposeUp(u_nf, dtype=self.dtype, name="shuf")(up_in)
        else:
            up_out = PixelShuffleICNR(u_nf, blur=self.blur, dtype=self.dtype, name="shuf")(up_in)
        if up_out.shape[1:3] != skip.shape[1:3]:
            # odd encoder sizes (e.g. 25 → 13 → 26): nearest-resize to the
            # skip grid, as fastai's F.interpolate fallback does.
            up_out = jax.image.resize(
                up_out, (up_out.shape[0], *skip.shape[1:3], up_out.shape[-1]), method="nearest"
            )
        s = batch_norm(train, dtype=self.dtype, name="bn")(
            skip.astype(self.dtype))
        cat = jnp.concatenate([up_out, s], axis=-1)
        cat = nn.relu(cat)
        ni = cat.shape[-1]
        nf = self.nf_out or (ni if self.final_div else ni // 2)
        x = ConvLayer(nf, 3, norm=self.norm, dtype=self.dtype, name="conv1")(cat, train)
        if not self.single_conv:
            x = ConvLayer(nf, 3, norm=self.norm, dtype=self.dtype, name="conv2")(x, train)
        if self.self_attention:
            x = SelfAttention(dtype=self.dtype, name="sa")(x, train)
        return x


class DynamicUnet(nn.Module):
    """U-Net over an XResNet body — the reference's flagship model.

    Logits come back in NHWC float32; callers choose softmax/argmax.
    """

    arch: str = "xresnet34"
    n_out: int = 2
    c_in: int = 3
    self_attention: bool = False
    blur: bool = True
    blur_final: bool = True
    last_cross: bool = True
    bottle: bool = False
    decoder_norm: Optional[str] = None  # reference-effective: no decoder norm
    remat: bool = False  # rematerialize blocks (fit larger batches in HBM)
    # TPU-optimized variant (opt-in, non-parity; quality-gated in
    # tests/test_pipeline_e2e.py): space-to-depth stem, and the last_cross
    # tail at half resolution — the final PixelShuffle + full-res ResBlock
    # are ~40% of the model's FLOPs at 512² and run on 99 channels (25% MXU
    # lane padding). Here last_cross fuses a 2x-downsampled input at /2 and
    # the logits are upsampled bilinearly at the end.
    tpu_opt: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 fold_logits: bool = False) -> jax.Array:
        """``fold_logits=True`` (tpu_opt only) returns the sub-pixel head's
        pre-shuffle logits (B, H/2, W/2, n_out·4) with (class, dy, dx)
        channel ordering — the train step computes the loss in this folded
        layout against a space-to-depth'd mask (losses.fold_targets), which
        is pixel-for-pixel the same loss while skipping the full-res
        pixel-shuffle transpose and its backward."""
        orig = x.astype(self.dtype)
        feats, skips = XResNetBody(self.arch, self.c_in, dtype=self.dtype,
                                   remat=self.remat, tpu_opt=self.tpu_opt,
                                   name="encoder")(orig, train)
        ub_cls = nn.remat(UnetBlock, static_argnums=(3,)) if self.remat else UnetBlock

        ni = feats.shape[-1]
        y = batch_norm(train, dtype=self.dtype, name="mid_bn")(feats)
        y = nn.relu(y)
        y = ConvLayer(ni * 2, 3, norm=self.decoder_norm, dtype=self.dtype, name="mid_conv1")(y, train)
        y = ConvLayer(ni, 3, norm=self.decoder_norm, dtype=self.dtype, name="mid_conv2")(y, train)

        n = len(skips)
        for i, skip in enumerate(skips):
            not_final = i != n - 1
            # tpu_opt: skip the anti-checkerboard blur — it doubles each
            # upsample's cost (replication-pad + stride-1 avg-pool are pure
            # HBM traffic at the block's full output res) while ICNR init
            # already suppresses checkerboarding; quality-gated e2e
            #
            # tpu_opt decoder diet: the fastai walk keeps decoder widths
            # near the encoder's (512/384/256/96) — 1.5–3 K-tiles per conv
            # and a 140-channel last_cross cat. Size the upsample so each
            # concat lands exactly on 128-lane MXU tiles (skip 64 → up 64,
            # else up 128) and keep nf = cat: a classic-U-Net-slim decoder
            # (384/256/128/…) where every conv runs full tiles. The final
            # block instead takes 128−4·c_in so the last_cross s2d concat is
            # exactly one K-tile. Quality-gated (e2e dice floor + aerial
            # fixture mIoU).
            if self.tpu_opt:
                skip_c = skip.shape[-1]
                rem = skip_c % 128
                up_nf = min(128 - rem if rem else 128, y.shape[-1] // 2)
                nf_out = max(128 - 4 * self.c_in, 64) if not not_final \
                    else skip_c + up_nf
            else:
                up_nf = nf_out = None
            y = ub_cls(
                final_div=not_final,
                blur=(not self.tpu_opt) and self.blur and (not_final or self.blur_final),
                self_attention=self.self_attention and (i == n - 3),
                norm=self.decoder_norm,
                convt_up=self.tpu_opt,
                up_nf=up_nf,
                nf_out=nf_out,
                single_conv=self.tpu_opt and not not_final,
                dtype=self.dtype,
                name=f"up_{i}",
            )(y, skip, train)

        if self.tpu_opt:
            # the folded stem guarantees the decoder lands at exactly /2
            # (its divisible-by-4 guard raises otherwise), so the half-res
            # tail is unconditional under tpu_opt — never a traced-shape
            # fallback that would change parameter structure
            assert y.shape[1] * 2 == orig.shape[1], (y.shape, orig.shape)
            # half-res tail: the full-res last_cross ResBlock is ~40% of
            # model FLOPs on 99 lanes (25% MXU padding). Instead: fuse the
            # input LOSSLESSLY via space-to-depth (every pixel reaches the
            # /2 features), run the ResBlock at /2, and emit per-subpixel
            # logits with a sub-pixel head (1×1 → n_out·4, pixel-shuffle) —
            # same per-pixel expressiveness, ~30% of the tail FLOPs.
            if self.last_cross:
                y = jnp.concatenate([y, space_to_depth_mxu(orig, 2)], axis=-1)
                ni_rb = y.shape[-1]
                y = ResBlockNoNorm(ni_rb // 2 if self.bottle else ni_rb,
                                   norm=self.decoder_norm, dtype=self.dtype,
                                   name="last_cross")(y, train)
            # (folding the head one level deeper — s2d(2) + 1×1 to n_out·16
            # at /4 — was tried for the lane-padding win but measured
            # +4.4 ms: the 128-ch s2d transpose pair and the 4× head FLOPs
            # outweigh it. Keep the /2 sub-pixel head.)
            sub = nn.Conv(
                self.n_out * 4, (1, 1), use_bias=True,
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype, param_dtype=jnp.float32, name="head",
            )(y)
            if fold_logits:
                # (returning bf16 here was tried — the loss upcasts
                # per-element anyway — but it perturbed XLA's layout choice
                # for the up_3/head chain, costing +1.4 ms; keep f32)
                return sub.astype(jnp.float32)
            return pixel_shuffle(sub, 2).astype(jnp.float32)

        if y.shape[1:3] != orig.shape[1:3]:
            # first encoder activation sits at /2, so one more shuffle
            # (fastai appends PixelShuffle_ICNR(ni) without blur here)
            y = PixelShuffleICNR(y.shape[-1], blur=False, dtype=self.dtype, name="final_shuf")(y)
        if y.shape[1:3] != orig.shape[1:3]:
            y = jax.image.resize(
                y, (y.shape[0], *orig.shape[1:3], y.shape[-1]), method="nearest"
            )

        if self.last_cross:
            y = jnp.concatenate([y, orig], axis=-1)
            ni_rb = y.shape[-1]
            y = ResBlockNoNorm(ni_rb // 2 if self.bottle else ni_rb, norm=self.decoder_norm,
                               dtype=self.dtype, name="last_cross")(y, train)

        logits = nn.Conv(
            self.n_out, (1, 1), use_bias=True,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype, param_dtype=jnp.float32, name="head",
        )(y)
        return logits.astype(jnp.float32)


class ResBlockNoNorm(nn.Module):
    """The last_cross ResBlock. Like layers.ResBlock (expansion 1, stride 1)
    but honoring the reference's no-norm decoder quirk."""

    nf: int
    norm: Optional[str] = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ni = x.shape[-1]
        y = ConvLayer(self.nf, 3, norm=self.norm, dtype=self.dtype, name="conv1")(x, train)
        second_norm = "batchzero" if self.norm == "batch" else self.norm
        y = ConvLayer(self.nf, 3, norm=second_norm, act=False, dtype=self.dtype, name="conv2")(y, train)
        idn = x
        if ni != self.nf:
            idn = ConvLayer(self.nf, 1, act=False, norm=self.norm, dtype=self.dtype, name="idconv")(idn, train)
        return nn.relu(y + idn)


def build_unet(
    arch: str = "xresnet34",
    n_out: int = 2,
    c_in: int = 3,
    self_attention: bool = False,
    dtype: Any = jnp.bfloat16,
    **kwargs,
) -> DynamicUnet:
    if arch not in ARCHS:
        raise ValueError(f"Unknown architecture {arch!r}; options: {sorted(ARCHS)}")
    return DynamicUnet(
        arch=arch, n_out=n_out, c_in=c_in, self_attention=self_attention, dtype=dtype, **kwargs
    )
