"""fastai-semantics Adam with one-cycle hypers and discriminative LR groups.

The reference trains with fastai's Adam under ``fit_one_cycle`` and
``lr_max=slice(lr/encoder_factor, lr)`` (train.py:246-250): decoupled weight
decay (wd=0.01, skipped for norm/bias params), b1 = cycled momentum, b2=0.99,
eps=1e-5 added *outside* the sqrt, bias-corrected, and a geometric LR spread
over the three xresnet parameter groups (stem / stages / decoder —
train.py:78-84 ``_xresnet_split``).

Implemented as a single custom optax ``GradientTransformation`` whose LR and
momentum are jnp functions of the step — schedule lives on device, so the
whole train step stays one fused XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array
Schedule = Callable[[Array], Array]  # traced step -> value


def jnp_cos_anneal(start: float, end: float, pos: Array) -> Array:
    return start + (end - start) * (1.0 - jnp.cos(jnp.pi * pos)) / 2.0


def jnp_combined_cos(
    pct_start: float, start: float, middle: float, end: float, total_steps: int
) -> Schedule:
    warm = max(1, int(round(total_steps * pct_start)))

    def sched(step: Array) -> Array:
        step = jnp.minimum(step, total_steps)
        up = jnp_cos_anneal(start, middle, step / warm)
        down = jnp_cos_anneal(middle, end, (step - warm) / max(total_steps - warm, 1))
        return jnp.where(step < warm, up, down)

    return sched


class FastaiAdamState(NamedTuple):
    count: Array
    # moments [mu; nu] as ONE (2, n) fp32 array over all params flattened.
    # Two separate jnp.zeros((n,)) leaves CSE into a single buffer under
    # jit(init), and donating that state then fails with "attempt to donate
    # the same buffer twice" — packing sidesteps buffer aliasing entirely.
    moments: Array
    # [lr_scale; wd_mask] as ONE (2, n) array, same aliasing rationale
    static: Array


def param_group_label(path: Tuple, _leaf=None) -> int:
    """Map a parameter path to its fastai LR group.

    0 = encoder stem convs, 1 = encoder stages, 2 = decoder/head — the
    ``_xresnet_split`` boundaries (train.py:78-84).
    """
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if keys and keys[0] == "encoder":
        if len(keys) > 1 and str(keys[1]).startswith("stem"):
            return 0
        return 1
    return 2


def label_params(params: Any) -> Any:
    return jax.tree_util.tree_map_with_path(lambda p, v: param_group_label(p), params)


def _flatten(tree: Any) -> Array:
    """Ravel+concatenate a pytree of fp32 leaves into one vector.

    Per-leaf optimizer math launches ~3 tiny kernels per parameter leaf
    (~900 for xresnet34-unet) at ~25 µs each through the axon platform —
    measured at ~24 ms/step, a quarter of the whole train step. In flat
    space the update is ~6 large fused kernels."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])


def _unflatten_like(flat: Array, tree: Any) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    off = 0
    for l in leaves:
        out.append(flat[off : off + l.size].reshape(l.shape).astype(l.dtype))
        off += l.size
    return jax.tree_util.tree_unflatten(treedef, out)


def fastai_adam(
    lr_fn: Schedule,
    mom_fn: Schedule,
    lr_scales: Any,
    sqr_mom: float = 0.99,
    eps: float = 1e-5,
    wd: float = 0.01,
    wd_bn_bias: bool = False,
) -> optax.GradientTransformation:
    """Adam + decoupled wd with scheduled LR/b1 and static per-leaf LR
    multipliers (the fastai discriminative-LR groups).

    ``lr_fn`` gives the top group's LR at a step; ``lr_scales`` is a pytree
    of python floats matching the params tree (group_lr / top_lr). The whole
    update runs in one flat fp32 vector space.
    """

    def init(params):
        # the per-element vectors live in optimizer STATE: as jit-captured
        # constants they would constant-fold into a ~165 MB HLO literal,
        # which the remote-compile tunnel rejects (HTTP 413 / INVALID_ARGUMENT)
        leaves = jax.tree_util.tree_leaves(params)
        scale_leaves = jax.tree_util.tree_leaves(lr_scales)
        n = sum(l.size for l in leaves)
        lr_vec = jnp.concatenate(
            [jnp.full((l.size,), float(s), jnp.float32)
             for l, s in zip(leaves, scale_leaves)])
        wd_vec = jnp.concatenate(
            [jnp.full((l.size,), 1.0 if (wd_bn_bias or l.ndim > 1) else 0.0,
                      jnp.float32) for l in leaves])
        return FastaiAdamState(count=jnp.zeros((), jnp.int32),
                               moments=jnp.zeros((2, n), jnp.float32),
                               static=jnp.stack([lr_vec, wd_vec]))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("fastai_adam requires params (for decoupled wd)")
        count = state.count + 1
        step0 = state.count  # hypers evaluated at the pre-step position, as fastai does
        b1 = mom_fn(step0)
        lr = lr_fn(step0) * state.static[0]
        wd_vec = state.static[1]

        g = _flatten(grads)
        p = _flatten(params)
        decay = jnp.stack([b1, jnp.asarray(sqr_mom, b1.dtype)])[:, None]
        g2 = jnp.stack([g, g * g])
        moments = decay * state.moments + (1.0 - decay) * g2
        mu, nu = moments[0], moments[1]
        debias1 = 1.0 - b1**count
        debias2 = 1.0 - sqr_mom**count
        delta = -lr * (mu / debias1) / (jnp.sqrt(nu / debias2) + eps)
        if wd:
            delta = delta - lr * wd * wd_vec * p

        updates = _unflatten_like(delta, params)
        return updates, FastaiAdamState(count=count, moments=moments,
                                        static=state.static)

    return optax.GradientTransformation(init, update)


def one_cycle_adam(
    params: Any,
    lr: float,
    total_steps: int,
    encoder_factor: float = 10.0,
    pct_start: float = 0.25,
    div: float = 25.0,
    div_final: float = 1e5,
    moms: Tuple[float, float, float] = (0.95, 0.85, 0.95),
    sqr_mom: float = 0.99,
    eps: float = 1e-5,
    wd: float = 0.01,
    n_groups: int = 3,
) -> Tuple[optax.GradientTransformation, Any]:
    """The reference's full training optimizer: one-cycle LR/momentum +
    discriminative LRs. Returns (tx, labels)."""
    from .schedule import even_mults

    group_lr_maxes = even_mults(lr / encoder_factor, lr, n_groups)
    # every group schedule is the top-group schedule scaled by m_g/lr, so
    # discriminative LRs reduce to one schedule + a static per-leaf scale
    lr_fn = jnp_combined_cos(pct_start, lr / div, lr, lr / div_final, total_steps)
    mom_fn = jnp_combined_cos(pct_start, moms[0], moms[1], moms[2], total_steps)
    labels = label_params(params)
    # clamp: with n_groups < 3 the highest path labels map to the last group
    # (round 1 relied on jnp's silent index clamping here)
    scales = jax.tree_util.tree_map(
        lambda g: float(group_lr_maxes[min(g, n_groups - 1)]) / float(lr), labels)
    tx = fastai_adam(lr_fn, mom_fn, scales, sqr_mom=sqr_mom, eps=eps, wd=wd)
    return tx, labels


def constant_lr_adam(
    params: Any,
    lr_fn: Schedule,
    mom: float = 0.9,
    sqr_mom: float = 0.99,
    eps: float = 1e-5,
    wd: float = 0.01,
) -> optax.GradientTransformation:
    """Single-group Adam with an arbitrary scheduled LR (used by the LR
    finder's exponential sweep, utils.py:150-167)."""
    scales = jax.tree_util.tree_map(lambda _: 1.0, params)
    return fastai_adam(lr_fn, lambda s: jnp.asarray(mom), scales,
                       sqr_mom=sqr_mom, eps=eps, wd=wd)
