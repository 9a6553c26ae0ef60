"""Device mesh + sharding for data- and spatially-parallel training/inference.

The reference is strictly single-GPU (``.cuda()``, train.py:187; no
torch.distributed anywhere — SURVEY.md §2.3). The TPU-native scale-out is
sharding over a ``jax.sharding.Mesh``: the batch axis is sharded across the
``data`` mesh axis, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI. Nothing here is NCCL-shaped — collectives are
compiler-inserted from sharding annotations.

Beyond data parallelism the mesh can carry a second ``space`` axis that
shards tile HEIGHT across chips (``make_mesh(spatial=N)``): GSPMD spatially
partitions every convolution/pool, inserting halo exchanges over ICI at
shard boundaries, and batch-norm statistics/loss reduces become cross-chip
all-reduces automatically. This serves tiles whose activations exceed one
chip's HBM (e.g. 4096² patches in ``unet_tpu serve --spatial N``) — a
capability with no reference analogue (the reference caps patch size by GPU
RAM, params_and_main.py:51).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
and the same code spans slices (DCN between hosts, ICI within).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: call once per host before ``make_mesh`` so the
    mesh spans every host's chips (DCN across hosts, ICI within a slice).
    No-op when JAX already runs single-process with explicit args absent."""
    if coordinator_address is None and num_processes is None:
        return  # single-host: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              spatial: int = 1) -> Mesh:
    """Data-parallel mesh, optionally with a second spatial axis.

    ``spatial=1``: 1-D ``(data,)`` mesh over all (or the given) devices.
    ``spatial=N``: 2-D ``(data, space)`` mesh — batches shard over ``data``
    and tile height over ``space`` (see module docstring). Adjacent devices
    land on the same ``space`` group so halo exchanges ride neighbor ICI
    links.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if spatial > 1:
        if len(devices) % spatial:
            raise ValueError(
                f"{len(devices)} devices do not divide into spatial={spatial} groups")
        grid = np.asarray(devices).reshape(len(devices) // spatial, spatial)
        return Mesh(grid, (DATA_AXIS, SPACE_AXIS))
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_size(mesh: Mesh) -> int:
    """Number of ways the batch axis is sharded."""
    return dict(mesh.shape).get(DATA_AXIS, mesh.devices.size)


def spatial_size(mesh: Mesh) -> int:
    """Number of ways tile height is sharded (1 on a data-only mesh)."""
    return dict(mesh.shape).get(SPACE_AXIS, 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across ``data`` — and, on a 2-D mesh,
    the second (height) axis across ``space``. Works for (B,H,W,C) images
    and (B,H,W) masks alike."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays: Any):
    """Device-put host arrays with the batch axis sharded across the mesh."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) if a is not None else None for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/opt state) on every device of the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def pad_to_multiple(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch size ≥ requested that divides evenly over the mesh's
    data axis (the only axis the batch shards over)."""
    n = data_size(mesh)
    return ((batch_size + n - 1) // n) * n


def prefetch_to_mesh(iterable, mesh: Mesh, depth: int = 2,
                     executor=None):
    """Overlap host→device transfer with compute: double-buffered sharding.

    Wraps an iterator of ``(images, masks, n_valid)`` host batches and
    yields the same tuples with images/masks already device-put under the
    batch sharding. ``depth`` transfers are kept in flight on a dedicated
    thread, so batch N+1's h2d copy rides alongside step N's compute
    instead of serializing in front of it (the reference's loader is fully
    synchronous — num_workers=0, train.py:345; round-2 measured the
    unoverlapped e2e path at step+transfer rather than max(step,
    transfer)).

    A thread (rather than relying on ``jax.device_put``'s own asynchrony)
    makes the overlap robust to platforms where the host-side copy blocks —
    e.g. the axon tunnel. The consumer must finish with the yielded arrays
    before requesting the next item (the training loop's donated-state data
    dependency already enforces this).
    """
    import concurrent.futures as cf
    from collections import deque

    own_pool = executor is None
    pool = executor or cf.ThreadPoolExecutor(max_workers=1,
                                             thread_name_prefix="h2d")
    sh = batch_sharding(mesh)

    def put(batch):
        images, masks, n_valid = batch
        images = jax.device_put(images, sh)
        if masks is not None:
            masks = jax.device_put(masks, sh)
        return images, masks, n_valid

    it = iter(iterable)
    inflight: deque = deque()
    try:
        for _ in range(max(1, depth)):
            try:
                inflight.append(pool.submit(put, next(it)))
            except StopIteration:
                break
        while inflight:
            fut = inflight.popleft()
            try:
                inflight.append(pool.submit(put, next(it)))
            except StopIteration:
                pass
            yield fut.result()
    finally:
        if own_pool:
            pool.shutdown(wait=False)
