"""Pallas TPU kernel: fused per-sample flip + scale augmentation.

BASELINE.json's north star calls for "Pallas-fused crop/flip/rotate/
normalize kernels" on the input path. The jnp augmentation path
(data/augment.py) materializes a flipped copy per flip op plus a scaling
pass — ~5 HBM sweeps over the batch; this kernel does ONE read and ONE
write per tile: vertical flips are resolved in the BlockSpec index map
(scalar-prefetched per-sample flags pick mirrored row blocks), horizontal
flips and value scaling happen in VMEM on the way through.

Gradients never flow into augmentation (it transforms inputs), so no custom
VJP is needed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _row_block(h: int) -> int:
    for rb in (256, 128, 64, 32, 16, 8):
        if h % rb == 0:
            return rb
    return h


def _anti_identity(n: int, dtype) -> Array:
    """Reversal permutation matrix (anti-diagonal ones).

    Pallas TPU has no lowering for ``lax.rev``; a permutation matmul runs
    on the MXU instead and costs microseconds at these sizes.
    """
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (i + j == n - 1).astype(dtype)


def _rev_rows(x: Array) -> Array:
    """Reverse axis 0 of (RB, W[, C]) via anti-identity @ x."""
    rb = x.shape[0]
    flat = x.reshape(rb, -1)
    out = jnp.dot(_anti_identity(rb, x.dtype), flat,
                  preferred_element_type=x.dtype)
    return out.reshape(x.shape)


def _rev_cols(x: Array) -> Array:
    """Reverse axis 1 of (RB, W[, C]) via x @ anti-identity over W."""
    w = x.shape[1]
    anti = _anti_identity(w, x.dtype)
    if x.ndim == 2:
        return jnp.dot(x, anti, preferred_element_type=x.dtype)
    return jax.lax.dot_general(
        x, anti, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
    ).transpose(0, 2, 1)


def _img_kernel(flags_ref, scales_ref, img_ref, out_ref):
    b = pl.program_id(0)
    x = img_ref[0]  # (RB, W, C)
    v = flags_ref[b, 1] > 0
    h = flags_ref[b, 0] > 0
    # the index map already mirrored WHICH block we read for vflip; here we
    # reverse rows within the block (vflip) and columns (hflip)
    x = jnp.where(v, _rev_rows(x), x)
    x = jnp.where(h, _rev_cols(x), x)
    out_ref[0] = x * scales_ref[b]


def _msk_kernel(flags_ref, img_ref, out_ref):
    b = pl.program_id(0)
    x = img_ref[0].astype(jnp.float32)  # (RB, W); small ints exact in fp32
    v = flags_ref[b, 1] > 0
    h = flags_ref[b, 0] > 0
    x = jnp.where(v, _rev_rows(x), x)
    x = jnp.where(h, _rev_cols(x), x)
    out_ref[0] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_flip_scale(
    images: Array,
    masks: Optional[Array],
    hflip: Array,
    vflip: Array,
    scales: Array,
    interpret: bool = False,
) -> Tuple[Array, Optional[Array]]:
    """Apply per-sample horizontal/vertical flips and value scaling.

    images: (B,H,W,C) float32; masks: (B,H,W) or None; hflip/vflip: (B,) bool;
    scales: (B,) float32 multiplier (the dtype normalization — folded into
    the same pass).
    """
    b, h, w, c = images.shape
    rb = _row_block(h)
    n_rb = h // rb
    flags = jnp.stack([hflip.astype(jnp.int32), vflip.astype(jnp.int32)], axis=1)

    def img_index(bi, ri, flags_ref, scales_ref):
        # vflip reads the mirrored row block
        mirrored = jnp.where(flags_ref[bi, 1] > 0, n_rb - 1 - ri, ri)
        return (bi, mirrored, 0, 0)

    def out_index(bi, ri, flags_ref, scales_ref):
        return (bi, ri, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_rb),
        in_specs=[pl.BlockSpec((1, rb, w, c), img_index, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rb, w, c), out_index, memory_space=pltpu.VMEM),
    )
    out_images = pl.pallas_call(
        _img_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(images.shape, images.dtype),
        interpret=interpret,
    )(flags, scales.astype(images.dtype), images)

    out_masks = None
    if masks is not None:
        def m_index(bi, ri, flags_ref):
            mirrored = jnp.where(flags_ref[bi, 1] > 0, n_rb - 1 - ri, ri)
            return (bi, mirrored, 0)

        def m_out_index(bi, ri, flags_ref):
            return (bi, ri, 0)

        m_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_rb),
            in_specs=[pl.BlockSpec((1, rb, w), m_index, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rb, w), m_out_index, memory_space=pltpu.VMEM),
        )
        out_masks = pl.pallas_call(
            _msk_kernel,
            grid_spec=m_spec,
            out_shape=jax.ShapeDtypeStruct(masks.shape, masks.dtype),
            interpret=interpret,
        )(flags, masks)
    return out_images, out_masks
