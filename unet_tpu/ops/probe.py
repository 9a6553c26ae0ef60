"""Pallas platform-capability probe.

The repo ships two custom kernels (ops/pallas_aug.py fused flip+scale,
ops/blend.py blocked mosaic blend) that are correctness-verified but gated
off in production: the axon platform's remote Mosaic compile helper crashes
(HTTP 500) on any in-body DMA whose slice offset derives from a
scalar-prefetch value — bisected in rounds 1-2, see BENCH_NOTES.md — and
the blend kernel measured slower than the XLA scan even where it compiles.

This module centralizes that gating so there are no silent dead defaults:

* :func:`scalar_prefetch_dma_supported` compiles+runs a minimal kernel
  exercising exactly the fragile feature, ONCE PER TOOLCHAIN (the result is
  cached on disk keyed by jax version + platform + backend version, so a
  platform update automatically retries the probe).
* ``bench.run_benchmark`` calls :func:`record_kernel_ab` each round when
  the probe passes: it A/B-times each kernel against its XLA fallback and
  stores the verdict in the same cache. A kernel becomes the production
  default only when (a) the platform compiles it and (b) it measured
  faster — both facts recorded, and surfaced in the bench stderr detail for
  BENCH_NOTES.
* :func:`describe` returns the current state for logging.

Environment overrides: ``UNET_TPU_FUSED_AUG=0/1`` and
``UNET_TPU_PALLAS_BLEND=0/1`` force either kernel off/on regardless.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

_CACHE: Optional[dict] = None  # in-process
_LAST_PROBE_ERROR: Optional[str] = None  # diagnostics for describe()


def _cache_path() -> Path:
    return Path(os.environ.get("UNET_TPU_PROBE_CACHE",
                               "/tmp/unet_tpu_pallas_probe.json"))


def _toolchain_key() -> str:
    import jax

    try:
        import jax.extend.backend  # not pulled in by `import jax` alone

        backend = jax.extend.backend.get_backend()
        plat = backend.platform
        ver = getattr(backend, "platform_version", "?")
    except Exception:
        plat, ver = "unknown", "?"
    return f"jax={jax.__version__};platform={plat};ver={ver}"


def _load() -> dict:
    global _CACHE
    if _CACHE is not None:
        return _CACHE
    p = _cache_path()
    try:
        data = json.loads(p.read_text())
    except Exception:
        data = {}
    if data.get("toolchain") != _toolchain_key():
        data = {"toolchain": _toolchain_key()}  # toolchain changed: re-probe
    _CACHE = data
    return data


def _store(data: dict) -> None:
    global _CACHE
    _CACHE = data
    try:
        _cache_path().write_text(json.dumps(data, indent=1))
    except OSError:
        pass  # read-only fs: in-process cache still works


def _on_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False


def scalar_prefetch_dma_supported() -> bool:
    """True when the platform compiles AND correctly runs an in-body DMA
    with a scalar-prefetch-derived slice offset (the bisected axon
    blocker). Cached per toolchain; CPU/GPU return False (the kernels are
    TPU-shaped). Transient infrastructure failures (tunnel/RPC outages on
    remote-compile rigs) are NOT persisted — only a genuine compiler
    rejection or a correctness mismatch is a toolchain verdict."""
    global _CACHE
    data = _load()
    if "scalar_prefetch_dma" in data:
        return bool(data["scalar_prefetch_dma"])
    if not _on_tpu():
        data["scalar_prefetch_dma"] = False
        _store(data)
        return False
    verdict = _probe_scalar_prefetch_dma()
    if verdict is None:  # transient: fail off for this process only
        _CACHE = dict(data, scalar_prefetch_dma=False, probe_transient=True,
                      probe_error=_LAST_PROBE_ERROR)
        return False
    data["scalar_prefetch_dma"] = verdict
    _store(data)
    return verdict


# Error texts that mean THE COMPILER rejected the kernel (a real toolchain
# verdict, cacheable) rather than the compile service being unreachable.
_COMPILER_MARKERS = ("mosaic", "lowering", "unsupported", "unimplemented",
                     "invalid_argument", "invalid argument", "verification",
                     "failed to compile", "not implemented")


def _classify_probe_error(msg: str) -> Optional[bool]:
    """False = compiler rejection (cache it); None = transient (don't)."""
    low = msg.lower()
    return False if any(m in low for m in _COMPILER_MARKERS) else None


def _probe_scalar_prefetch_dma() -> Optional[bool]:
    try:
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(off_ref, src_ref, out_ref, scratch, sem):
            dma = pltpu.make_async_copy(
                src_ref.at[pl.ds(off_ref[0] * 8, 8), :], scratch, sem)
            dma.start()
            dma.wait()
            out_ref[:] = scratch[:]

        x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
        off = jnp.asarray([1], jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(off, x)
        return bool(jnp.allclose(jax.device_get(out), jax.device_get(x)[8:16]))
    except Exception as e:
        global _LAST_PROBE_ERROR
        _LAST_PROBE_ERROR = f"{type(e).__name__}: {e}"[:300]
        return _classify_probe_error(_LAST_PROBE_ERROR)


def record_kernel_ab(name: str, kernel_ms: float, fallback_ms: float) -> None:
    """Record a measured kernel-vs-XLA A/B (called by bench each round)."""
    data = _load()
    data[f"ab_{name}"] = {
        "kernel_ms": round(kernel_ms, 3),
        "fallback_ms": round(fallback_ms, 3),
        "kernel_faster": kernel_ms < fallback_ms,
    }
    _store(data)


def _enabled(env_var: str, ab_name: str) -> bool:
    forced = os.environ.get(env_var)
    if forced is not None:
        return forced not in ("0", "false", "")
    if not scalar_prefetch_dma_supported():
        return False
    ab = _load().get(f"ab_{ab_name}")
    return bool(ab and ab.get("kernel_faster"))


def fused_aug_enabled() -> bool:
    """Production default for ops/pallas_aug.fused_flip_scale: on only when
    the platform compiles it AND this round's bench measured it faster."""
    return _enabled("UNET_TPU_FUSED_AUG", "fused_aug")


def blend_kernel_enabled() -> bool:
    """Production default for ops/blend's Pallas path (same contract)."""
    return _enabled("UNET_TPU_PALLAS_BLEND", "blend")


def describe() -> dict:
    data = dict(_load())
    data["fused_aug_enabled"] = fused_aug_enabled()
    data["blend_kernel_enabled"] = blend_kernel_enabled()
    return data
