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
    mu: Any  # first-moment pytree matching params
    nu: Any  # second-moment pytree


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
    of python floats matching the params tree (group_lr / top_lr) that folds
    into each leaf's fused update kernel as a constant — no dynamic gather.

    Perf notes (BENCH_NOTES.md round 2): per-leaf kernels measured FASTER
    in-step than a flattened single-vector update (the ravel/concat +
    unflatten passes cost more than ~320 small fused kernels), so this stays
    tree-shaped. Do NOT wrap ``init`` in ``jax.jit``: equal-shaped zero
    leaves CSE into one buffer under jit and a later donation of the state
    fails with "attempt to donate the same buffer twice"; eager init
    allocates distinct buffers.
    """

    def init(params):
        return FastaiAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("fastai_adam requires params (for decoupled wd)")
        count = state.count + 1
        step0 = state.count  # hypers evaluated at the pre-step position, as fastai does
        b1 = mom_fn(step0)
        lr = lr_fn(step0)
        debias1 = 1.0 - b1**count
        debias2 = 1.0 - sqr_mom**count

        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1.0 - b1) * g,
                                    state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: sqr_mom * v + (1.0 - sqr_mom) * g * g,
                                    state.nu, grads)

        def step_leaf(m, v, p, scale):
            leaf_lr = lr * float(scale)
            delta = -leaf_lr * (m / debias1) / (jnp.sqrt(v / debias2) + eps)
            if wd and (wd_bn_bias or p.ndim > 1):
                delta = delta - leaf_lr * wd * p
            return delta

        updates = jax.tree_util.tree_map(step_leaf, mu, nu, params, lr_scales)
        return updates, FastaiAdamState(count=count, mu=mu, nu=nu)

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
