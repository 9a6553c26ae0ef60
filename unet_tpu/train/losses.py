"""Segmentation losses with fastai ``*Flat`` semantics, in pure JAX.

The reference trains with fastai losses (train.py:189-196;
params_and_main.py:16): ``CrossEntropyLossFlat(axis=1, weight)``,
``FocalLossFlat``, ``MSELossFlat``, ``L1LossFlat``, ``DiceLoss``. Each
"Flat" loss flattens the class axis out of (B,C,H,W) logits and (B,H,W)
targets before applying the torch loss; the semantics that matter are
reproduced exactly (notably torch's weighted-CE mean, which divides by the
sum of selected class weights, not the element count).

All losses take NHWC float32 logits (our model layout) and integer/float
targets, and return a scalar. ``weight`` is a length-C class-weight vector.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _pixel_mask(shape, sample_mask: Optional[Array]) -> Array:
    """Broadcast a per-sample validity mask (B,) to pixel shape (B,H,W,...)."""
    if sample_mask is None:
        return jnp.ones(shape, jnp.float32)
    extra = (1,) * (len(shape) - 1)
    return jnp.broadcast_to(
        sample_mask.astype(jnp.float32).reshape(-1, *extra), shape
    )


def _nll_and_weight(logits: Array, targets: Array, weight: Optional[Array]):
    """Per-pixel negative log-likelihood via one-hot contraction.

    TPU-friendly: a one-hot multiply-sum over the (small) class axis runs on
    the VPU and fuses into the log_softmax, unlike ``take_along_axis``
    gathers which lower to slow scatter/gather ops.
    """
    # upcast per-element (fuses into the log_softmax kernel): callers may
    # pass bf16 logits (the folded tpu_opt train path) without materializing
    # an f32 copy of a lane-padded tensor
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets.astype(jnp.int32), logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    w = None if weight is None else jnp.sum(weight * onehot, axis=-1)
    return nll, w


def fold_loss_layout(logits: Array, targets: Array) -> tuple:
    """Lay out folded (pre-pixel-shuffle) logits and full-res targets so any
    loss above computes the exact full-resolution value.

    ``logits``: (B, H/r, W/r, C·r²) from ``DynamicUnet(..., fold_logits=
    True)`` with pixel-shuffle channel ordering (class, dy, dx); ``targets``:
    (B, H, W). Pixel-shuffle is a pixel permutation and every loss here
    reduces over all pixels, so computing in the folded layout is
    bit-equivalent while skipping the full-res transpose and its backward.
    Returns (logits', targets') shaped (B, H/r, W·r, C) and (B, H/r, W·r).
    """
    b, h, w, crr = logits.shape
    r = targets.shape[1] // h
    c = crr // (r * r)
    lg = logits.reshape(b, h, w, c, r * r)  # channel index = c·r² + dy·r + dx
    lg = jnp.moveaxis(lg, -1, 3).reshape(b, h, w * r * r, c)
    t = targets.reshape(b, h, r, w, r)
    t = t.transpose(0, 1, 3, 2, 4).reshape(b, h, w * r * r)  # phase = dy·r+dx
    return lg, t


def cross_entropy(
    logits: Array, targets: Array, weight: Optional[Array] = None,
    sample_mask: Optional[Array] = None,
) -> Array:
    """torch ``F.cross_entropy(..., weight, reduction='mean')``.

    Weighted mean = sum(w[y] * nll) / sum(w[y]) — torch semantics the
    reference relies on via CrossEntropyLossFlat(axis=1, weight=...)
    (train.py:195). ``sample_mask`` excludes padded eval samples.
    """
    nll, w = _nll_and_weight(logits, targets, weight)
    m = _pixel_mask(nll.shape, sample_mask)
    w = m if w is None else w * m
    return jnp.sum(w * nll) / jnp.sum(w)


def focal_loss(
    logits: Array, targets: Array, gamma: float = 2.0, weight: Optional[Array] = None,
    sample_mask: Optional[Array] = None,
) -> Array:
    """fastai FocalLoss: ``((1 - exp(-ce))**gamma * ce).mean()`` with
    per-element weighted CE (reduction='none' then plain mean)."""
    nll, w = _nll_and_weight(logits, targets, weight)
    if w is not None:
        nll = nll * w
    p_t = jnp.exp(-nll)
    m = _pixel_mask(nll.shape, sample_mask)
    return jnp.sum((1.0 - p_t) ** gamma * nll * m) / jnp.sum(m)


def _masked_mean(vals: Array, sample_mask: Optional[Array]) -> Array:
    m = _pixel_mask(vals.shape, sample_mask)
    return jnp.sum(vals * m) / jnp.sum(m)


def mse_loss(preds: Array, targets: Array, sample_mask: Optional[Array] = None) -> Array:
    """MSELossFlat (train.py:191)."""
    return _masked_mean((preds.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2, sample_mask)


def l1_loss(preds: Array, targets: Array, sample_mask: Optional[Array] = None) -> Array:
    return _masked_mean(jnp.abs(preds.astype(jnp.float32) - targets.astype(jnp.float32)), sample_mask)


def smooth_l1_loss(preds: Array, targets: Array, beta: float = 0.5,
                   sample_mask: Optional[Array] = None) -> Array:
    """utils.py:145-147 ``Smoothl1`` (torch SmoothL1Loss with beta=0.5)."""
    d = jnp.abs(preds.astype(jnp.float32) - targets.astype(jnp.float32))
    return _masked_mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta), sample_mask)


def dice_loss(
    logits: Array, targets: Array, smooth: float = 1e-6, square_in_union: bool = False,
    sample_mask: Optional[Array] = None,
) -> Array:
    """fastai DiceLoss (reduction='sum' default): softmax probabilities,
    per-(sample, class) dice over spatial dims, summed."""
    n_c = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets.astype(jnp.int32), n_c, dtype=jnp.float32)
    # (B, H, W, C) → per-sample/per-class sums over spatial dims
    inter = jnp.sum(probs * onehot, axis=(1, 2))
    if square_in_union:
        union = jnp.sum(probs**2 + onehot, axis=(1, 2))
    else:
        union = jnp.sum(probs + onehot, axis=(1, 2))
    dice = (2.0 * inter + smooth) / (union + smooth)
    loss = 1.0 - dice
    if sample_mask is not None:
        loss = loss * sample_mask.astype(jnp.float32)[:, None]
    return jnp.sum(loss)


LOSSES: dict = {
    "cross_entropy": cross_entropy,
    "focal": focal_loss,
    "mse": mse_loss,
    "l1": l1_loss,
    "smooth_l1": smooth_l1_loss,
    "dice": dice_loss,
}


def build_loss(
    name: str,
    regression: bool = False,
    weight: Optional[Array] = None,
    gamma: float = 2.0,
) -> Callable[[Array, Array], Array]:
    """Resolve a loss by name with the reference's defaulting rules:
    None → MSE for regression, weighted CE for classification
    (train.py:189-196)."""
    if name is None:
        name = "mse" if regression else "cross_entropy"
    name = name.lower()
    if name in ("cross_entropy", "crossentropylossflat", "ce"):
        return lambda lg, t, sample_mask=None: cross_entropy(lg, t, weight, sample_mask)
    if name in ("focal", "focallossflat"):
        return lambda lg, t, sample_mask=None: focal_loss(lg, t, gamma, weight, sample_mask)
    if name in ("mse", "mselossflat"):
        return mse_loss
    if name in ("l1", "l1lossflat"):
        return l1_loss
    if name in ("smooth_l1", "smoothl1"):
        return smooth_l1_loss
    if name in ("dice", "diceloss"):
        return dice_loss
    raise ValueError(f"Unknown loss {name!r}; options: {sorted(LOSSES)}")
