"""Backend-selection guards for the remote-TPU ("axon") rig.

The TPU on this rig is reached through a tunnel whose backend factory can
block FOREVER at first device access when the transport is down — even in
processes that only want the CPU platform (observed 2026-08-19: a
``JAX_PLATFORMS=cpu`` 128x128 matmul hung >120 s; same failure mode as
BENCH_NOTES round 3). Every CPU-only subprocess (tests, scaling bench,
multichip dry runs) must therefore DROP the axon backend factory before
first device access, not merely set ``JAX_PLATFORMS=cpu``.
"""

from __future__ import annotations

import os
import re


def force_cpu_backend(device_count: int | None = None) -> None:
    """Pin this process to the CPU platform and make that pin safe.

    Sets ``JAX_PLATFORMS=cpu`` (env + config), optionally requests
    ``device_count`` virtual host devices (must happen before JAX
    initializes), and removes the axon backend factory so a down TPU
    tunnel cannot block CPU-only work. Idempotent; call before the first
    JAX device access.
    """
    if device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" in flags:
            # An inherited pin (e.g. a CI XLA_FLAGS=...=1) must not silently
            # override the explicit request — replace it.
            flags = re.sub(
                r"--?xla_force_host_platform_device_count=\d+",
                f"--xla_force_host_platform_device_count={device_count}",
                flags,
            )
            os.environ["XLA_FLAGS"] = flags
        else:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={device_count}"
            ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        if not _xb._backends:  # too late once a backend exists
            _xb._backend_factories.pop("axon", None)
    except Exception:
        pass  # private API moved: JAX_PLATFORMS=cpu still stands
