"""`unet_tpu doctor` — environment and runtime diagnostics.

The reference's failure mode for a broken environment is a GDAL import
error three stack frames deep (utils.py:39). A production framework should
answer "is this box ready to train/serve, and at what capability level?"
in one command: versions, devices and their HBM, mesh construction, the
native decoder ABI, optional codecs, Pallas kernel availability, and the
compilation cache — each as an isolated check that can't take the others
down.

Note: if the TPU transport itself is unreachable, ``jax.devices()`` can
block inside the platform plugin before any of this code runs — run with
a shell timeout when diagnosing a suspect rig.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple


def _check(fn: Callable[[], Tuple[bool, str]]) -> Tuple[bool, str]:
    try:
        return fn()
    except Exception as e:  # diagnostics never crash
        return False, f"{type(e).__name__}: {e}"


def _versions() -> Tuple[bool, str]:
    import flax
    import jax
    import numpy as np
    import optax

    import unet_tpu

    return True, (f"unet_tpu {unet_tpu.__version__}, jax {jax.__version__}, "
                  f"flax {flax.__version__}, optax {optax.__version__}, "
                  f"numpy {np.__version__}")


def _devices() -> Tuple[bool, str]:
    import jax

    devs = jax.devices()
    line = f"{len(devs)} × {devs[0].platform}"
    try:
        stats = devs[0].memory_stats() or {}
        if "bytes_limit" in stats:
            line += f", {stats['bytes_limit'] / 2**30:.1f} GiB memory each"
    except Exception:
        pass  # memory_stats is optional on some backends
    return True, line


def _mesh() -> Tuple[bool, str]:
    import jax

    from ..parallel.mesh import make_mesh

    m = make_mesh(jax.devices())
    return True, f"data-parallel mesh {dict(m.shape)}"


def _native() -> Tuple[bool, str]:
    from .. import native

    if not native.available():
        return False, ("libunet_native.so unavailable (g++ build failed or "
                       "ABI mismatch) — loader falls back to the Python codec")
    lib = native.get_lib()
    return True, (f"libunet_native.so ABI v{lib.unet_native_version()} "
                  "(batch TIFF decode, LZW/PackBits/deflate, JPEG incl. "
                  "progressive)")


def _optional_deps() -> Tuple[bool, str]:
    found = []
    for mod, why in (("PIL", "JPEG-in-TIFF fallback + codec cross-checks"),
                     ("torch", "pretrained-weight import"),
                     ("tqdm", "per-tile progress bars")):
        try:
            __import__(mod)
            found.append(mod)
        except ImportError:
            found.append(f"{mod} MISSING ({why})")
    return all("MISSING" not in f for f in found), ", ".join(found)


def _compile_cache() -> Tuple[bool, str]:
    from .compile_cache import enable_compile_cache

    d = enable_compile_cache()
    return True, (f"persistent XLA cache at {d}" if d else "disabled")


def _pallas() -> Tuple[bool, str]:
    from ..ops.probe import blend_kernel_enabled, fused_aug_enabled

    aug, blend = fused_aug_enabled(), blend_kernel_enabled()
    return True, (f"fused_aug={'on' if aug else 'off (XLA fallback)'}, "
                  f"blend_kernel={'on' if blend else 'off (XLA scan)'}")


def run_doctor(pallas: bool = False) -> Dict[str, Tuple[bool, str]]:
    """Run every check; print a report; return {name: (ok, detail)}.

    ``pallas=True`` additionally probes the Pallas toolchain (compiles two
    tiny kernels — slow on a remote-compile rig, hence opt-in).
    """
    checks: List[Tuple[str, Callable]] = [
        ("versions", _versions),
        ("devices", _devices),
        ("mesh", _mesh),
        ("native decoder", _native),
        ("optional deps", _optional_deps),
        ("compile cache", _compile_cache),
    ]
    if pallas:
        checks.append(("pallas kernels", _pallas))
    results: Dict[str, Tuple[bool, str]] = {}
    for name, fn in checks:
        ok, detail = _check(fn)
        results[name] = (ok, detail)
        print(f"  {'ok ' if ok else 'FAIL'}  {name:<16} {detail}")
    hard = [n for n in ("versions", "devices", "mesh") if not results[n][0]]
    print("doctor: " + ("all checks passed" if all(ok for ok, _ in results.values())
                        else f"issues found{' (blocking: ' + ', '.join(hard) + ')' if hard else ''}"))
    return results
