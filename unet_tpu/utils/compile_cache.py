"""Persistent XLA compilation cache.

The reference pays no compile cost (torch eager); under jit every program
is XLA-compiled once per process — tens of seconds for the big train step
on a remote-compile TPU rig. JAX's persistent compilation cache keys the
compiled executable on (HLO, compiler version, platform), so repeated runs
of the same pipeline — retraining with new data, re-serving scenes, CI —
skip compilation entirely.

Enabled by default at the framework's entry points (Trainer, Predictor,
ArtifactPredictor, CLI) the first time one constructs. Control with the
``UNET_TPU_COMPILE_CACHE`` env var: a path selects the cache directory,
``0``/``off`` disables, unset defaults to ``~/.cache/unet_tpu/xla``.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_ENABLED: Optional[str] = None


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Idempotently point JAX's persistent compilation cache at a directory.

    Returns the cache dir in use, or None when disabled. Safe to call from
    every entry point — only the first call configures anything.
    """
    global _ENABLED
    if _ENABLED is not None:
        return _ENABLED or None
    env = os.environ.get("UNET_TPU_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "false", "none"):
        _ENABLED = ""
        return None
    if not (cache_dir or env):
        # default-on only for accelerator platforms: the win is the
        # 20-40 s TPU step compile. XLA:CPU AOT entries reload with a
        # machine-feature mismatch warning (and a documented SIGILL risk
        # on heterogeneous fleets), and CPU compiles are quick — so
        # CPU-only runs skip the cache unless a dir is set explicitly.
        # Read the platform CONFIG, never a backend (init can block when
        # the TPU transport is down).
        try:
            import jax

            plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        except Exception:
            plats = os.environ.get("JAX_PLATFORMS", "")
        tokens = [t for t in str(plats).replace(",", " ").split() if t]
        if tokens and all(t == "cpu" for t in tokens):
            _ENABLED = ""
            return None
    target = cache_dir or env or str(Path.home() / ".cache" / "unet_tpu" / "xla")
    try:
        Path(target).mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", target)
        # default min_compile_time (1s) skips tiny programs — keep it; the
        # big train/predict steps are the ones worth persisting
        # Subprocesses (bench detail sections, multiprocess loaders) must
        # share the cache too: JAX reads this env var at config init, so
        # exporting it makes every child a cache client without needing to
        # call this function before its first jit.
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", target)
    except Exception as e:  # unwritable dir, exotic backend — never fatal
        print(f"compile cache disabled ({e})")
        _ENABLED = ""
        return None
    _ENABLED = target
    return target
