"""Pallas TPU kernels: single-pass batch-norm statistic reductions.

The round-2 op trace attributed 17.7 ms/step (92 reduce ops) of the
flagship train step to BN statistics (BENCH_NOTES.md). Two reduction
families dominate, one per pass:

* forward: per-channel ``sum(x)`` and ``sum(x*x)`` (flax's fast-variance
  path, ``var = E[x²] − E[x]²``)
* backward: per-channel ``sum(dy)`` and ``sum(dy * xhat)`` (the dscale /
  dbias terms, which also feed dx)

Each family is two reductions over the SAME operand traffic. The round-3
attempt to fuse them with a variadic ``lax.reduce``
(models.layers.FusedStatsBatchNorm) lowered to a serial loop and measured
2.1× SLOWER (BENCH_NOTES round-4 A/B) — the idea is sound, the lowering
was the loss. These kernels do the fusion by hand: one grid walk over row
blocks of the ``(N, C)`` view, both partial sums accumulated in an
f32 VMEM-resident ``(2, C)`` output block, so the operand is read from HBM
exactly once. The backward kernel recomputes ``xhat`` in VMEM from the
saved per-channel mean/inv instead of materializing it to HBM.

:func:`batch_norm_train` wires them into a ``jax.custom_vjp`` whose
forward numerics follow flax ``nn.BatchNorm`` (f32 stats, dtype-cast
normalize) and whose backward is the standard BN gradient. Production
gating follows the ops/probe.py contract: correctness-pinned everywhere,
default-on only after a real-chip A/B win (``UNET_TPU_BN=pallas`` forces).

Reference context: the reference's BN cost lives inside torch/cudnn
(``nn.BatchNorm2d`` in every fastai ConvLayer, train.py:98-160); this is
the TPU-native replacement for that fused-cudnn behavior.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _row_block(n: int, c: int) -> int:
    """Largest row block dividing n with a (block × c × 4B) VMEM footprint
    ≤ ~2 MB; 0 when n has no usable divisor (caller falls back to jnp)."""
    cap = max(8, min(2048, (2 * 1024 * 1024) // max(4 * c, 1)))
    for rb in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if rb <= cap and n % rb == 0:
            return rb
    return 0


def supported(n: int, c: int) -> bool:
    """True when the (N, C) view blocks cleanly for the TPU kernels."""
    return c >= 8 and _row_block(n, c) > 0


def _stats_kernel(x_ref, out_ref):
    """Accumulate (sum, sum_sq) per channel across the row-block grid."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...].astype(jnp.float32)
    s = jnp.sum(x, axis=0, keepdims=True)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    out_ref[...] += jnp.concatenate([s, s2], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sum_and_sumsq(x2d: Array, interpret: bool = False) -> Array:
    """One-pass per-channel ``(sum(x), sum(x²))`` of an (N, C) view.

    Returns a (2, C) float32 array: row 0 the sums, row 1 the sums of
    squares. Requires ``supported(N, C)``.
    """
    n, c = x2d.shape
    rb = _row_block(n, c)
    return pl.pallas_call(
        _stats_kernel,
        grid=(n // rb,),
        in_specs=[pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=interpret,
    )(x2d)


def _bwd_kernel(mi_ref, g_ref, x_ref, out_ref):
    """Accumulate (sum(g), sum(g·xhat)); xhat recomputed in VMEM."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = g_ref[...].astype(jnp.float32)
    x = x_ref[...].astype(jnp.float32)
    xhat = (x - mi_ref[0:1, :]) * mi_ref[1:2, :]
    sg = jnp.sum(g, axis=0, keepdims=True)
    sgx = jnp.sum(g * xhat, axis=0, keepdims=True)
    out_ref[...] += jnp.concatenate([sg, sgx], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bn_bwd_sums(g2d: Array, x2d: Array, mean: Array, inv: Array,
                interpret: bool = False) -> Array:
    """One-pass ``(sum(g), sum(g·xhat))`` per channel, xhat from (x, mean,
    inv). Returns (2, C) float32."""
    n, c = x2d.shape
    rb = _row_block(n, c)
    mi = jnp.stack([mean.astype(jnp.float32), inv.astype(jnp.float32)])
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n // rb,),
        in_specs=[
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=interpret,
    )(mi, g2d, x2d)


# --- custom-vjp batch norm ----------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def batch_norm_train(x: Array, scale: Array, bias: Array, eps: float,
                     dtype, interpret: bool = False
                     ) -> Tuple[Array, Array, Array]:
    """Training-mode batch norm over all-but-last axes.

    Returns ``(y, mean, var)`` — mean/var are f32 batch statistics for the
    running-average update (no gradient flows through them; they feed flax
    variables). Normalize numerics follow flax nn.BatchNorm: stats in f32,
    the normalization itself in ``dtype``.
    """
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, eps, dtype, interpret)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps, dtype, interpret):
    c = x.shape[-1]
    n = x.size // c
    x2d = x.reshape(n, c)
    s = sum_and_sumsq(x2d, interpret=interpret)
    mean = s[0] / n
    var = jnp.maximum(s[1] / n - mean * mean, 0.0)
    d = dtype
    inv32 = jax.lax.rsqrt(var + eps)
    # flax casts mean/var to the compute dtype BEFORE rsqrt — match it so
    # the y produced here equals nn.BatchNorm's to bf16 rounding
    mul = jax.lax.rsqrt(var.astype(d) + jnp.asarray(eps, d)) * scale.astype(d)
    y = (x.astype(d) - mean.astype(d)) * mul + bias.astype(d)
    return y, mean, var, inv32


def _bn_fwd(x, scale, bias, eps, dtype, interpret):
    y, mean, var, inv32 = _bn_fwd_impl(x, scale, bias, eps, dtype, interpret)
    return (y, mean, var), (x, scale, mean, inv32)


def _bn_bwd(eps, dtype, interpret, res, cts):
    x, scale, mean, inv = res
    dy = cts[0]  # mean/var cotangents: running-stat buffers, no gradient
    c = x.shape[-1]
    n = x.size // c
    sums = bn_bwd_sums(dy.reshape(n, c), x.reshape(n, c), mean, inv,
                       interpret=interpret)
    dbias, dscale = sums[0], sums[1]
    # dx = scale·inv · (dy − mean(dy) − xhat·mean(dy·xhat)); the elementwise
    # pass is left to XLA, which fuses it into the surrounding graph
    g32 = dy.astype(jnp.float32).reshape(n, c)
    xhat = (x.reshape(n, c).astype(jnp.float32) - mean) * inv
    dx = (scale.astype(jnp.float32) * inv) * (
        g32 - dbias / n - xhat * (dscale / n))
    return (dx.reshape(x.shape).astype(x.dtype),
            dscale.astype(scale.dtype), dbias.astype(scale.dtype))


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)
