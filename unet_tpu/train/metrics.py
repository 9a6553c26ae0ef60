"""Streaming metrics with fastai-equivalent epoch semantics.

The reference tracks DiceMulti for classification and rmse/R² for regression
(train.py:190-196). fastai accumulates sufficient statistics across the
whole validation epoch and reduces once; these metric objects do the same so
values match regardless of batch size. Accumulation state is a small pytree
of device scalars — cheap to carry through a jitted eval step and to
``psum`` across a data-parallel mesh.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


# --- DiceMulti ----------------------------------------------------------------


def dice_multi_init(n_classes: int) -> Dict[str, Array]:
    return {
        "inter": jnp.zeros((n_classes,), jnp.float32),
        "union": jnp.zeros((n_classes,), jnp.float32),
    }


def dice_multi_update(
    state: Dict[str, Array], logits: Array, targets: Array, sample_mask: Array = None
) -> Dict[str, Array]:
    """Accumulate per-class intersection/union of argmax predictions.

    fastai DiceMulti: inter = |pred∩targ|, union = |pred|+|targ| per class,
    summed over the epoch; value = nanmean(2·inter/union). ``sample_mask``
    excludes padded eval samples.
    """
    n_c = state["inter"].shape[0]
    pred = jnp.argmax(logits, axis=-1)
    pred1 = jax.nn.one_hot(pred, n_c, dtype=jnp.float32)
    targ1 = jax.nn.one_hot(targets.astype(jnp.int32), n_c, dtype=jnp.float32)
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32).reshape(-1, *([1] * (pred1.ndim - 1)))
        pred1 = pred1 * m
        targ1 = targ1 * m
    axes = tuple(range(pred1.ndim - 1))
    inter = jnp.sum(pred1 * targ1, axis=axes)
    union = jnp.sum(pred1, axis=axes) + jnp.sum(targ1, axis=axes)
    return {"inter": state["inter"] + inter, "union": state["union"] + union}


def dice_multi_value(state: Dict[str, Array]) -> Array:
    """nanmean of per-class binary dice: classes absent from both pred and
    target (union == 0) are excluded, as fastai's np.nanmean does."""
    union = state["union"]
    present = union > 0
    dice = jnp.where(present, 2.0 * state["inter"] / jnp.where(present, union, 1.0), 0.0)
    n_present = jnp.maximum(jnp.sum(present), 1)
    return jnp.sum(dice) / n_present


# --- regression metrics ---------------------------------------------------------


def regression_init() -> Dict[str, Array]:
    return {
        "sse": jnp.zeros((), jnp.float32),   # sum of squared errors
        "sae": jnp.zeros((), jnp.float32),   # sum of absolute errors
        "sum_y": jnp.zeros((), jnp.float32),
        "sum_y2": jnp.zeros((), jnp.float32),
        "count": jnp.zeros((), jnp.float32),
    }


def regression_update(
    state: Dict[str, Array], preds: Array, targets: Array, sample_mask: Array = None
) -> Dict[str, Array]:
    p = preds.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32).reshape(-1, *([1] * (y.ndim - 1)))
        m = jnp.broadcast_to(m, y.shape).ravel()
    else:
        m = jnp.ones(y.size, jnp.float32)
    p, y = p.ravel(), y.ravel()
    return {
        "sse": state["sse"] + jnp.sum(m * (p - y) ** 2),
        "sae": state["sae"] + jnp.sum(m * jnp.abs(p - y)),
        "sum_y": state["sum_y"] + jnp.sum(m * y),
        "sum_y2": state["sum_y2"] + jnp.sum(m * y * y),
        "count": state["count"] + jnp.sum(m),
    }


def rmse_value(state: Dict[str, Array]) -> Array:
    return jnp.sqrt(state["sse"] / jnp.maximum(state["count"], 1.0))


def r2_value(state: Dict[str, Array]) -> Array:
    """R² = 1 - SS_res / SS_tot computed from streaming sums (matches
    sklearn.metrics.r2_score over the concatenated epoch)."""
    n = jnp.maximum(state["count"], 1.0)
    ss_tot = state["sum_y2"] - state["sum_y"] ** 2 / n
    return 1.0 - state["sse"] / jnp.maximum(ss_tot, 1e-12)


# --- misc ---------------------------------------------------------------------


def foreground_acc(logits: Array, targets: Array, bkg_idx: int = 0) -> Array:
    """fastai foreground_acc: accuracy over pixels whose target is not the
    background class."""
    pred = jnp.argmax(logits, axis=-1)
    mask = targets != bkg_idx
    correct = jnp.sum((pred == targets) & mask)
    return correct / jnp.maximum(jnp.sum(mask), 1)
