"""Device mesh + sharding for data-parallel training and inference.

The reference is strictly single-GPU (``.cuda()``, train.py:187; no
torch.distributed anywhere — SURVEY.md §2.3). The TPU-native scale-out is
data parallelism over a 1-D ``jax.sharding.Mesh``: the batch axis is sharded
across chips, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI. Nothing here is NCCL-shaped — collectives are
compiler-inserted from sharding annotations.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
and the same code spans slices (DCN between hosts, ICI within).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


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


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
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
    """Smallest batch size ≥ requested that divides evenly over the mesh."""
    n = mesh.devices.size
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
