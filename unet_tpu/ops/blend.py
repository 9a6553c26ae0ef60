"""Pallas TPU kernel: on-device overlap-blend mosaic accumulation.

The reference merges prediction tiles on the host: every tile's probability
stack is shipped device→host, then scatter-added into a sum raster + overlap
counter in numpy (predict.py:284-302). On TPU the device→host hop per tile
is the bottleneck (the driver tunnel measures single-digit MB/s); this
kernel keeps the whole mosaic in HBM and scatter-adds each predicted tile
batch at its dynamic (row, col) offset, so only the finished mosaic crosses
to host once.

Design notes (see /opt/skills/guides/pallas_guide.md):
* mosaic lives in ``pltpu.ANY`` (compiler-placed, HBM for big mosaics) and
  is aliased input→output — a true in-place accumulation
* per-tile (row, col) offsets ride in scalar-prefetch SMEM
  (``PrefetchScalarGridSpec``) so the kernel can compute its DMA slices
  before the body runs
* each grid step DMAs the target window HBM→VMEM, adds the tile (VPU),
  and DMAs back; TPU grid steps execute sequentially on the core, so the
  read-modify-write is race-free even for overlapping tiles
* the overlap counter is carried as an extra trailing channel, folded into
  the same buffer to halve DMA count
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blend_kernel(rows_ref, cols_ref, tiles_ref, mosaic_ref, out_ref,
                  scratch, sem_in, sem_out):
    del mosaic_ref  # aliased with out_ref; all RMW goes through out_ref so
    # earlier grid steps' writes are visible (grid steps run sequentially)
    i = pl.program_id(0)
    r0 = rows_ref[i]
    c0 = cols_ref[i]
    th, tw = tiles_ref.shape[1], tiles_ref.shape[2]

    load = pltpu.make_async_copy(
        out_ref.at[pl.ds(r0, th), pl.ds(c0, tw), :], scratch, sem_in
    )
    load.start()
    load.wait()
    scratch[:] = scratch[:] + tiles_ref[0]
    store = pltpu.make_async_copy(
        scratch, out_ref.at[pl.ds(r0, th), pl.ds(c0, tw), :], sem_out
    )
    store.start()
    store.wait()


@partial(jax.jit, donate_argnums=(0,), static_argnames=("interpret",))
def blend_tiles(mosaic: jax.Array, tiles: jax.Array, rows: jax.Array,
                cols: jax.Array, interpret: bool = False) -> jax.Array:
    """Scatter-add ``tiles[i]`` into ``mosaic`` at (rows[i], cols[i]).

    mosaic: (H, W, C) float32 — donated, updated in place.
    tiles:  (N, th, tw, C) float32.
    rows/cols: (N,) int32 window offsets (0 ≤ r ≤ H-th).
    """
    n, th, tw, c = tiles.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, th, tw, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((th, tw, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _blend_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(mosaic.shape, mosaic.dtype),
        input_output_aliases={3: 0},  # mosaic (input index incl. prefetch args) → output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(rows.astype(jnp.int32), cols.astype(jnp.int32), tiles, mosaic)


def blend_tiles_xla(mosaic: jax.Array, tiles: jax.Array, rows: jax.Array,
                    cols: jax.Array) -> jax.Array:
    """Reference XLA implementation (scan of dynamic_update_slice) — used
    for verification and as fallback on non-TPU backends."""

    def body(m, inp):
        tile, r, c = inp
        window = jax.lax.dynamic_slice(m, (r, c, 0), tile.shape)
        return jax.lax.dynamic_update_slice(m, window + tile, (r, c, 0)), None

    out, _ = jax.lax.scan(body, mosaic, (tiles, rows.astype(jnp.int32),
                                         cols.astype(jnp.int32)))
    return out


class DeviceMosaic:
    """Device-resident sum+count mosaic for merge-mode prediction.

    The count rides as one extra channel so a single blend call updates
    both. ``finalize()`` fetches the mosaic to host once and divides.
    """

    def __init__(self, height: int, width: int, n_classes: int, use_pallas: bool = False):
        self.n_classes = n_classes
        self.buf = jnp.zeros((height, width, n_classes + 1), jnp.float32)
        # the Pallas kernel is correctness-verified (interpret mode) but the
        # current axon Mosaic build crashes on DMA offsets derived from
        # scalar-prefetch values (platform bug, see BENCH_NOTES.md); the XLA
        # scan path gives the same on-device accumulation and is the default
        self.use_pallas = use_pallas and jax.default_backend() == "tpu"

    def add_batch(self, probs: jax.Array, rows: np.ndarray, cols: np.ndarray) -> None:
        """probs: (N, th, tw, C) device array; rows/cols host offsets."""
        ones = jnp.ones((*probs.shape[:3], 1), jnp.float32)
        tiles = jnp.concatenate([probs.astype(jnp.float32), ones], axis=-1)
        r = jnp.asarray(rows, jnp.int32)
        c = jnp.asarray(cols, jnp.int32)
        if self.use_pallas:
            self.buf = blend_tiles(self.buf, tiles, r, c)
        else:
            self.buf = blend_tiles_xla(self.buf, tiles, r, c)

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        """(summed (C,H,W), counter (H,W)) on host."""
        host = np.asarray(jax.device_get(self.buf))
        summed = np.moveaxis(host[..., : self.n_classes], 2, 0)
        counter = host[..., self.n_classes]
        return summed, counter
