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


def cross_entropy(
    logits: Array, targets: Array, weight: Optional[Array] = None
) -> Array:
    """torch ``F.cross_entropy(..., weight, reduction='mean')``.

    Weighted mean = sum(w[y] * nll) / sum(w[y]) — torch semantics the
    reference relies on via CrossEntropyLossFlat(axis=1, weight=...)
    (train.py:195).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if weight is None:
        return jnp.mean(nll)
    w = weight[targets.astype(jnp.int32)]
    return jnp.sum(w * nll) / jnp.sum(w)


def focal_loss(
    logits: Array, targets: Array, gamma: float = 2.0, weight: Optional[Array] = None
) -> Array:
    """fastai FocalLoss: ``((1 - exp(-ce))**gamma * ce).mean()`` with
    per-element weighted CE (reduction='none' then plain mean)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if weight is not None:
        nll = nll * weight[targets.astype(jnp.int32)]
    p_t = jnp.exp(-nll)
    return jnp.mean((1.0 - p_t) ** gamma * nll)


def mse_loss(preds: Array, targets: Array) -> Array:
    """MSELossFlat (train.py:191)."""
    return jnp.mean((preds.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2)


def l1_loss(preds: Array, targets: Array) -> Array:
    return jnp.mean(jnp.abs(preds.astype(jnp.float32) - targets.astype(jnp.float32)))


def smooth_l1_loss(preds: Array, targets: Array, beta: float = 0.5) -> Array:
    """utils.py:145-147 ``Smoothl1`` (torch SmoothL1Loss with beta=0.5)."""
    d = jnp.abs(preds.astype(jnp.float32) - targets.astype(jnp.float32))
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def dice_loss(
    logits: Array, targets: Array, smooth: float = 1e-6, square_in_union: bool = False
) -> Array:
    """fastai DiceLoss (reduction='sum' default): softmax probabilities,
    per-(sample, class) dice over spatial dims, summed."""
    n_c = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets.astype(jnp.int32), n_c, dtype=jnp.float32)
    # (B, H, W, C) → per-sample/per-class sums over spatial dims
    inter = jnp.sum(probs * onehot, axis=(1, 2))
    if square_in_union:
        union = jnp.sum(probs**2 + onehot, axis=(1, 2))
    else:
        union = jnp.sum(probs + onehot, axis=(1, 2))
    dice = (2.0 * inter + smooth) / (union + smooth)
    return jnp.sum(1.0 - dice)


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
        return lambda lg, t: cross_entropy(lg, t, weight)
    if name in ("focal", "focallossflat"):
        return lambda lg, t: focal_loss(lg, t, gamma, weight)
    if name in ("mse", "mselossflat"):
        return mse_loss
    if name in ("l1", "l1lossflat"):
        return l1_loss
    if name in ("smooth_l1", "smoothl1"):
        return smooth_l1_loss
    if name in ("dice", "diceloss"):
        return dice_loss
    raise ValueError(f"Unknown loss {name!r}; options: {sorted(LOSSES)}")
