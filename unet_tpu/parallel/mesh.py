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
