"""Pallas TPU kernel: fused per-sample flip + scale augmentation.

BASELINE.json's north star calls for "Pallas-fused crop/flip/rotate/
normalize kernels" on the input path. The jnp augmentation path
(data/augment.py) materializes a flipped copy per flip op plus a scaling
pass — ~5 HBM sweeps over the batch; this kernel does ONE read and ONE
write per tile: each (row-block, lane-block) of the output pulls its
mirrored source block via the scalar-prefetched per-sample flags in the
BlockSpec index map, and the within-block reversal + value scaling happen
in VMEM on the way through.

Mosaic constraints shaped this design (probed per toolchain, ops/probe.py
and BENCH_NOTES round-3):

* ``lax.rev`` has no TPU lowering and in-kernel gathers
  (``take``/``take_along_axis``) crash the Mosaic compiler — reversal must
  be a permutation **matmul** (MXU, microseconds at these sizes).
* Reshapes that merge the lane dimension (``(RB,W,C)->(RB,W*C)``) are
  unsupported shape casts *inside* the kernel — so the kernel operates on a
  2-D ``(B*H, W*C)`` view taken OUTSIDE (free: the NHWC batch is contiguous
  row-major, the reshape is a bitcast).
* ``precision=Precision.HIGHEST`` on in-kernel dots crashes Mosaic, and the
  default MXU path rounds f32 operands to bf16 — lossy. Flips must be
  bit-exact (tests pin equality with the jnp fallback), so each dot is a
  3-way Dekker split: x = hi + mid + lo with each term exactly
  bf16-representable (8+8+8 = 24 mantissa bits), permuted separately and
  re-summed. Permutation matrices are 0/1 (bf16-exact), each product is a
  value*1.0 (exact), f32 accumulation over zeros is exact, and the final
  (hi+mid)+lo re-sum reconstructs the full 24-bit mantissa exactly.

Gradients never flow into augmentation (it transforms inputs), so no custom
VJP is needed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _row_block(h: int) -> int:
    for rb in (256, 128, 64, 32, 16, 8):
        if h % rb == 0:
            return rb
    return h


def _lane_block(w: int) -> int:
    """Widest W-block (in pixels) with a power-of-two divisor of w, capped
    at 128 so an f32 lane-block times a small channel count stays a clean
    multiple of the 128-lane register width on hardware."""
    for lb in (128, 64, 32, 16, 8, 4, 2):
        if w % lb == 0:
            return lb
    return w


def hardware_shapes_ok(h: int, w: int) -> bool:
    """True when (h, w) tiles block cleanly for the real-TPU kernel:
    row blocks of >=8 and 128-pixel lane blocks. Anything else (odd tile
    sizes) should take the jnp fallback rather than feed Mosaic a ragged
    layout; interpret mode has no such constraint."""
    return h % 8 == 0 and w % 128 == 0


def _rev_groups(n_groups: int, group: int) -> np.ndarray:
    """(n_groups*group, n_groups*group) 0/1 matrix reversing the order of
    ``n_groups`` contiguous groups of ``group`` lanes (W reversed, C kept)."""
    n = n_groups * group
    p = np.zeros((n, n), np.float32)
    src = (np.arange(n_groups)[::-1, None] * group + np.arange(group)[None, :]).ravel()
    p[src, np.arange(n)] = 1.0
    return p


def splits_for(dtype_str: str) -> int:
    """bf16 split count that keeps flips exact for a storage dtype.

    Flip inputs are RAW storage values (scaling happens after the flip in
    the same kernel): 'int8' tiles are integers <= 255 -> exactly
    bf16-representable (1 split); 'int16' integers <= 65535 need 16 mantissa
    bits (2 splits); anything else (float rasters) gets the full 24-bit
    3-way split."""
    return {"int8": 1, "int16": 2}.get(dtype_str, 3)


def _splitn(x: Array, n: int) -> Tuple[Array, ...]:
    """Exact n-way bf16 split of f32: x == sum(parts), each part
    bf16-representable (Dekker splitting; 8 mantissa bits per part)."""
    parts = []
    rem = x
    for _ in range(n - 1):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        rem = rem - p.astype(jnp.float32)
    parts.append(rem.astype(jnp.bfloat16))
    return tuple(parts)


def _exact_rdot(x: Array, p_bf16: Array, n_splits: int) -> Array:
    """Bit-exact x @ P for 0/1 permutation P (see module docstring)."""
    out = None
    for part in _splitn(x, n_splits):
        d = jnp.dot(part, p_bf16, preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


def _exact_ldot(a_bf16: Array, x: Array, n_splits: int) -> Array:
    """Bit-exact A @ x for 0/1 permutation A."""
    out = None
    for part in _splitn(x, n_splits):
        d = jnp.dot(a_bf16, part, preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


def _kernel(flags_ref, scales_ref, anti_ref, perm_ref, img_ref, out_ref,
            *, rb: int, lb: int, n_cb: int, cb: int, scaled: bool,
            n_splits: int):
    b = pl.program_id(0)
    v = flags_ref[b, 1] > 0
    h = flags_ref[b, 0] > 0
    x = img_ref[...]
    # the index map already mirrored WHICH row block we read (vflip); finish
    # by reversing rows within the block. hflip is done entirely in VMEM: a
    # static loop over column sub-blocks pulls each one's mirrored source
    # through a small fixed permutation matmul — same FLOPs as mirroring
    # blocks in the index map, but one grid step per row block instead of
    # n_cb (per-step overhead dominated the first version, BENCH_NOTES)
    if rb > 1:
        x = jnp.where(v, _exact_ldot(anti_ref[...], x, n_splits), x)
    if lb > 1 or n_cb > 1:
        parts = [
            _exact_rdot(x[:, (n_cb - 1 - j) * cb:(n_cb - j) * cb],
                        perm_ref[...], n_splits)
            for j in range(n_cb)
        ]
        hx = jnp.concatenate(parts, axis=1) if n_cb > 1 else parts[0]
        x = jnp.where(h, hx, x)
    out_ref[...] = x * scales_ref[b] if scaled else x


def _flip_pass(flat: Array, flags: Array, scales: Array, h: int, w: int,
               c: int, scaled: bool, n_splits: int, interpret: bool) -> Array:
    """One fused pass over a (B*H, W*C) f32 view."""
    bh, wc = flat.shape
    b = bh // h
    rb = _row_block(h)
    lb = _lane_block(w)
    n_rb, n_cb = h // rb, w // lb
    cb = lb * c

    anti = jnp.asarray(_rev_groups(rb, 1), jnp.bfloat16)
    perm = jnp.asarray(_rev_groups(lb, c), jnp.bfloat16)

    def in_index(bi, ri, flags_ref, scales_ref):
        row = jnp.where(flags_ref[bi, 1] > 0, n_rb - 1 - ri, ri)
        return (bi * n_rb + row, 0)

    def out_index(bi, ri, flags_ref, scales_ref):
        return (bi * n_rb + ri, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_rb),
        in_specs=[
            pl.BlockSpec((rb, rb), lambda bi, ri, f, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, cb), lambda bi, ri, f, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, wc), in_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, wc), out_index, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, rb=rb, lb=lb, n_cb=n_cb, cb=cb,
                          scaled=scaled, n_splits=n_splits),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        interpret=interpret,
    )(flags, scales, anti, perm, flat)


@functools.partial(jax.jit, static_argnames=("interpret", "n_splits"))
def fused_flip_scale(
    images: Array,
    masks: Optional[Array],
    hflip: Array,
    vflip: Array,
    scales: Array,
    interpret: bool = False,
    n_splits: int = 3,
) -> Tuple[Array, Optional[Array]]:
    """Apply per-sample horizontal/vertical flips and value scaling.

    images: (B,H,W,C) float32; masks: (B,H,W) or None; hflip/vflip: (B,) bool;
    scales: (B,) float32 multiplier (the dtype normalization — folded into
    the same pass). Bit-identical to the jnp fallback (tests/test_ops.py).

    ``n_splits`` is the exactness hint from :func:`splits_for`: how many
    bf16 matmul passes the image values need (int8 tiles: 1; int16: 2;
    float: 3). The default is always-exact.
    """
    b, h, w, c = images.shape
    flags = jnp.stack([hflip.astype(jnp.int32), vflip.astype(jnp.int32)], axis=1)
    scales = scales.astype(jnp.float32)

    flat = images.astype(jnp.float32).reshape(b * h, w * c)
    out_images = _flip_pass(flat, flags, scales, h, w, c, scaled=True,
                            n_splits=n_splits,
                            interpret=interpret).reshape(images.shape)

    out_masks = None
    if masks is not None:
        # int class ids are exact in f32 (< 2^24) and the permutation dots
        # are exact by construction, so the int -> f32 -> int round trip is
        # lossless; 2 splits cover ids < 2^16 (class counts never exceed
        # that), float regression masks get the full 3
        msplits = 2 if jnp.issubdtype(masks.dtype, jnp.integer) else 3
        mflat = masks.astype(jnp.float32).reshape(b * h, w)
        out = _flip_pass(mflat, flags, jnp.ones((b,), jnp.float32), h, w, 1,
                         scaled=False, n_splits=msplits, interpret=interpret)
        out_masks = out.reshape(masks.shape).astype(masks.dtype)
    return out_images, out_masks
