"""On-device batch augmentation + value scaling.

The reference augments on CPU per image via Albumentations with a
GPU→numpy→GPU round-trip per augmented image (utils.py:196-295) — its
biggest data-path sink (SURVEY.md §3.2). Here augmentation is a jitted,
vectorized jnp program over the whole device batch: XLA fuses the flips,
brightness/contrast and dropout into the input pipeline, so augmentation is
effectively free next to the conv FLOPs.

Semantics reproduced:
* default pipeline = HorizontalFlip(p=.5) + VerticalFlip(p=.5)
  (params_and_main.py:105-115); RandomBrightnessContrast and CoarseDropout
  supported as the reference keeps them available (commented defaults)
* only the first ``ceil(B · n_transform_imgs)`` images of a batch are
  augmented (utils.py:240-256). Under ``reference_quirks`` the reference's
  off-by-one is reproduced: a fraction of exactly 1.0 augments *nothing*
  (slice ``[:ceil(B·1)-B] == [:0]``, SURVEY.md C6)
* value scaling per detected dtype (utils.py:245-295): 'int16' tiles are
  divided by 255, 'int8' passed through ("reference" normalize mode, so the
  network sees the same 0..255-ish ranges as the reference); "unit" mode
  scales to [0,1] instead. Under ``reference_quirks`` augmented int16 images
  get the reference's slightly different ÷65535·255 scale
* ``split_idx`` gating: 0 → train batches only, 1 → valid only, None → both
  (utils.py:217, params_and_main.py:103)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclass(frozen=True)
class AugmentConfig:
    hflip_p: float = 0.5
    vflip_p: float = 0.5
    rot90_p: float = 0.0  # random 90° rotation (square tiles only)
    brightness_limit: Tuple[float, float] = (-0.1, 0.1)
    contrast_limit: Tuple[float, float] = (-0.1, 0.1)
    brightness_contrast_p: float = 0.0
    saturation_limit: Tuple[float, float] = (-0.3, 0.3)
    saturation_p: float = 0.0  # fastai Saturation (params_and_main.py:13 import)
    coarse_dropout_p: float = 0.0
    dropout_holes: int = 8
    dropout_size: int = 8

    def describe(self) -> dict:
        """Transform-name → probability map for the run manifest
        (utils.py:381 ``aug_params_``)."""
        d = {}
        if self.hflip_p:
            d["HorizontalFlip"] = self.hflip_p
        if self.vflip_p:
            d["VerticalFlip"] = self.vflip_p
        if self.rot90_p:
            d["RandomRotate90"] = self.rot90_p
        if self.brightness_contrast_p:
            d["RandomBrightnessContrast"] = self.brightness_contrast_p
        if self.saturation_p:
            d["Saturation"] = self.saturation_p
        if self.coarse_dropout_p:
            d["CoarseDropout"] = self.coarse_dropout_p
        if not d:
            d["NoOp"] = 1.0
        return d


NOOP_AUGMENT = AugmentConfig(hflip_p=0.0, vflip_p=0.0)


def image_scale(dtype_str: str, normalize: str = "reference") -> float:
    """Scalar multiplier applied to raw tile values before the network."""
    if normalize == "reference":
        return 1.0 / 255.0 if dtype_str == "int16" else 1.0
    if normalize == "unit":
        return 1.0 / 65535.0 if dtype_str == "int16" else 1.0 / 255.0
    raise ValueError(f"Unknown normalize mode {normalize!r} (reference|unit)")


def value_max(dtype_str: str, normalize: str = "reference") -> float:
    """Upper end of the post-scaling value range (for brightness offsets)."""
    if normalize == "unit":
        return 1.0
    return 257.0 if dtype_str == "int16" else 255.0


def n_augmented(batch_size: int, n_transform_imgs: float, reference_quirks: bool = False) -> int:
    if not (0 <= n_transform_imgs <= 1):
        raise ValueError(
            f"The n_transform_imgs parameter ({n_transform_imgs}) must be between 1 and 0."
        )
    n = math.ceil(batch_size * n_transform_imgs)
    if reference_quirks and n >= batch_size:
        return 0  # utils.py:255: slice [:ceil(B·1)-B] == [:0]
    return min(n, batch_size)


def _flip_images(images: Array, flags: Array, axis: int,
                 precision=jax.lax.Precision.HIGHEST) -> Array:
    """Conditionally reverse one spatial axis of a float image batch.

    On TPU the (B,H,W,3) layout is lane-starved, so ``lax.rev`` + ``select``
    moves ~30 GB/s (traced); instead multiply by a per-sample permutation
    matrix — identity or anti-identity picked by ``flags`` — on the MXU.
    Each output element is ``1·x + Σ 0·x``, so the result is bit-exact in
    any float dtype. Integer inputs (masks) keep the rev path.
    """
    n = images.shape[axis]
    if images.size < (1 << 16):
        flipped = jnp.flip(images, axis=axis)
        shape = [-1] + [1] * (images.ndim - 1)
        return jnp.where(flags.reshape(shape), flipped, images)
    if images.dtype.kind != "f":
        # integer masks ride the same path: class ids are exact in f32 and
        # the permutation product is exact, so the round trip is lossless
        # (and ~4× faster than the lane-starved s32 rev+select chain)
        return _flip_images(images.astype(jnp.float32), flags, axis).astype(images.dtype)
    i = jnp.arange(n)
    eye = (i[:, None] == i[None, :])
    anti = (i[:, None] == (n - 1 - i)[None, :])
    perm = jnp.where(flags[:, None, None], anti[None], eye[None]).astype(images.dtype)
    if images.ndim == 3:
        sub = "bhw,bwv->bhv" if axis == 2 else "bhw,bhu->buw"
    else:
        sub = "bhwc,bwv->bhvc" if axis == 2 else "bhwc,bhu->buwc"
    # HIGHEST: default matmul precision on TPU rounds f32 operands to bf16,
    # which would perturb pixel values; full-precision passes keep the
    # permutation bit-exact and this op is tiny next to the model's convs.
    # Callers that KNOW their values are bf16-exact (raw int8 tiles at
    # scale 1.0) pass DEFAULT — same bits, one MXU pass instead of six
    return jnp.einsum(sub, images, perm, precision=precision,
                      preferred_element_type=jnp.float32).astype(images.dtype)


@partial(jax.jit, static_argnames=("cfg", "n_aug", "max_val", "img_precision"))
def _augment(
    key: Array,
    images: Array,
    masks: Optional[Array],
    cfg: AugmentConfig,
    n_aug: int,
    max_val: float,
    img_precision=jax.lax.Precision.HIGHEST,
) -> Tuple[Array, Optional[Array]]:
    b, h, w, _c = images.shape
    in_range = (jnp.arange(b) < n_aug)
    keys = jax.random.split(key, 6)

    def gate(k, p):
        return in_range & (jax.random.uniform(k, (b,)) < p)

    if cfg.rot90_p > 0 and h == w:
        k_g, k_n = jax.random.split(keys[4])
        f = gate(k_g, cfg.rot90_p)
        n_rot = jax.random.randint(k_n, (b,), 1, 4)  # 90/180/270
        k_eff = jnp.where(f, n_rot, 0)

        def rot_k(x, spatial_axes):
            outs = [x] + [jnp.rot90(x, k, axes=spatial_axes) for k in (1, 2, 3)]
            stacked = jnp.stack(outs)  # (4, B, ...)
            sel = k_eff.reshape(1, b, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(stacked, sel, axis=0)[0]

        images = rot_k(images, (1, 2))
        if masks is not None:
            masks = rot_k(masks, (1, 2))

    if cfg.hflip_p > 0:
        f = gate(keys[0], cfg.hflip_p)
        images = _flip_images(images, f, axis=2, precision=img_precision)
        if masks is not None:
            masks = _flip_images(masks, f, axis=2)
    if cfg.vflip_p > 0:
        f = gate(keys[1], cfg.vflip_p)
        images = _flip_images(images, f, axis=1, precision=img_precision)
        if masks is not None:
            masks = _flip_images(masks, f, axis=1)

    if cfg.brightness_contrast_p > 0:
        k_a, k_b, k_g = jax.random.split(keys[2], 3)
        f = gate(k_g, cfg.brightness_contrast_p)
        alpha = 1.0 + jax.random.uniform(
            k_a, (b,), minval=cfg.contrast_limit[0], maxval=cfg.contrast_limit[1]
        )
        beta = jax.random.uniform(
            k_b, (b,), minval=cfg.brightness_limit[0], maxval=cfg.brightness_limit[1]
        )
        adjusted = images * alpha[:, None, None, None] + (beta * max_val)[:, None, None, None]
        images = jnp.where(f[:, None, None, None], adjusted, images)

    if cfg.saturation_p > 0:
        k_g, k_s = jax.random.split(keys[5])
        f = gate(k_g, cfg.saturation_p)
        sat = 1.0 + jax.random.uniform(
            k_s, (b,), minval=cfg.saturation_limit[0], maxval=cfg.saturation_limit[1]
        )
        gray = jnp.mean(images, axis=-1, keepdims=True)
        adjusted = gray + (images - gray) * sat[:, None, None, None]
        images = jnp.where(f[:, None, None, None], adjusted, images)

    if cfg.coarse_dropout_p > 0:
        k_g, k_pos = jax.random.split(keys[3])
        f = gate(k_g, cfg.coarse_dropout_p)
        rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
        keep = jnp.ones((b, h, w), bool)
        pos = jax.random.randint(
            k_pos, (cfg.dropout_holes, 2, b), 0,
            jnp.array([max(h - cfg.dropout_size, 1), max(w - cfg.dropout_size, 1)])[:, None],
        )
        for i in range(cfg.dropout_holes):
            r0 = pos[i, 0][:, None, None]
            c0 = pos[i, 1][:, None, None]
            hole = (rows >= r0) & (rows < r0 + cfg.dropout_size) & \
                   (cols >= c0) & (cols < c0 + cfg.dropout_size)
            keep &= ~hole
        keep = jnp.where(f[:, None, None], keep, True)
        images = images * keep[..., None].astype(images.dtype)

    return images, masks


def _flips_only(cfg: AugmentConfig) -> bool:
    return (cfg.rot90_p == 0 and cfg.brightness_contrast_p == 0
            and cfg.saturation_p == 0 and cfg.coarse_dropout_p == 0)


def augment_batch(
    key: Array,
    images: Array,
    masks: Optional[Array],
    cfg: AugmentConfig,
    n_transform_imgs: float = 1.0,
    dtype_str: str = "int8",
    normalize: str = "reference",
    split: str = "train",
    split_idx: Optional[int] = 0,
    reference_quirks: bool = False,
    use_fused: Optional[bool] = None,
) -> Tuple[Array, Optional[Array]]:
    """Scale + (conditionally) augment one device batch.

    ``images``: (B,H,W,C) raw tile values as float32. Scaling is always
    applied; geometric/photometric augmentation only when ``split`` matches
    ``split_idx`` (0=train, 1=valid, None=both).

    On TPU, the default flip-only pipeline routes through the fused Pallas
    kernel (ops/pallas_aug.py): one HBM read + one write per tile instead of
    a scaling pass plus a materialized copy per flip. Randomness matches the
    jnp path exactly (same key splits).
    """
    b = images.shape[0]
    scale = image_scale(dtype_str, normalize)
    n_aug = n_augmented(b, n_transform_imgs, reference_quirks)
    active = split_idx is None or (split_idx == 0 and split == "train") or (
        split_idx == 1 and split == "valid"
    )
    if reference_quirks and dtype_str == "int16" and active and n_aug > 0:
        # reference scales augmented int16 images by 255/65535 instead of
        # 1/255 (utils.py:264 vs :288) — a 0.8% mismatch it trains with
        quirk = (255.0 / 65535.0) / scale
        scales = jnp.where(jnp.arange(b) < n_aug, scale * quirk, scale)
    else:
        scales = jnp.full((b,), scale, jnp.float32)

    if active and n_aug > 0 and _flips_only(cfg):
        if use_fused is None:
            # gated by the central platform probe (ops/probe.py): on only
            # when the toolchain compiles scalar-prefetch-derived DMA (the
            # bisected axon blocker, BENCH_NOTES.md) AND the bench A/B
            # measured the kernel faster this round — re-probed per
            # toolchain update, overridable with UNET_TPU_FUSED_AUG=0/1
            from ..ops.probe import fused_aug_enabled

            use_fused = fused_aug_enabled()
        if use_fused:
            from ..ops.pallas_aug import (fused_flip_scale,
                                          hardware_shapes_ok, splits_for)

            if hardware_shapes_ok(images.shape[1], images.shape[2]):
                in_range = jnp.arange(b) < n_aug
                keys = jax.random.split(key, 6)  # same structure as _augment
                hf = in_range & (jax.random.uniform(keys[0], (b,)) < cfg.hflip_p)
                vf = in_range & (jax.random.uniform(keys[1], (b,)) < cfg.vflip_p)
                return fused_flip_scale(images, masks, hf, vf, scales,
                                        n_splits=splits_for(dtype_str))

    images = images * scales[:, None, None, None]
    if not active or n_aug == 0:
        return images, masks
    # raw int8 tiles at scale 1.0 are integers <= 255: exactly
    # bf16-representable, so single-pass (DEFAULT) permutation matmuls flip
    # them bit-exactly at 1/6th the MXU passes of HIGHEST
    img_precision = (jax.lax.Precision.DEFAULT
                     if dtype_str == "int8" and scale == 1.0
                     else jax.lax.Precision.HIGHEST)
    return _augment(key, images, masks, cfg, n_aug,
                    value_max(dtype_str, normalize),
                    img_precision=img_precision)
