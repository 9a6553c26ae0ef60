#!/usr/bin/env python
"""Device-resident A/B: s8×s8→s32 conv vs bf16 conv on the real chip.

tools/probe_int8.py established int8 conv/dot LOWER and EXECUTE on v5e,
but its timings were h2d-dominated (numpy args re-transferred per rep
through the ~87 MB/s axon tunnel). This A/B keeps everything device-
resident and times a lax.scan of K convs with per-iteration kernels (no
CSE), scalar-fetch sync — the BENCH_NOTES methodology — so the number is
the conv itself. v5e peak is 394 TOPS int8 vs 197 TFLOPs bf16; if the
measured ratio approaches 2×, a W8A8 serving path is worth building.

Shapes probed: the flagship predict path's two FLOP centers at bs16 —
the half-res tail conv and a mid-decoder conv.
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

K = 16


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def time_conv(x, ws, reps=4):
    """x: (B,H,W,C) device array; ws: (K,3,3,C,F) device array."""

    @jax.jit
    def run(x, ws):
        def body(acc, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=(
                    jnp.int32 if x.dtype == jnp.int8 else jnp.float32))
            return acc + y[0, 0, 0, :8].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), ws)
        return acc

    _sync(run(x, ws))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(run(x, ws))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3  # ms per conv


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    for (b, h, w, c, f) in ((16, 256, 256, 99, 99), (16, 128, 128, 256, 256)):
        x8 = jax.device_put(rng.integers(-127, 127, (b, h, w, c)).astype(np.int8))
        w8 = jax.device_put(rng.integers(-127, 127, (K, 3, 3, c, f)).astype(np.int8))
        xb = jax.device_put(rng.standard_normal((b, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
        wb = jax.device_put(rng.standard_normal((K, 3, 3, c, f)).astype(np.float32)).astype(jnp.bfloat16)
        gflop = 2 * b * h * w * c * f * 9 / 1e9
        for name, xx, ww in (("s8", x8, w8), ("bf16", xb, wb)):
            try:
                ms = time_conv(xx, ww)
                print(f"  ({b},{h},{w},{c})->{f} {name:5s} {ms:8.3f} ms"
                      f"  {gflop / ms:7.1f} T{'OP' if name == 's8' else 'FLOP'}/s")
            except Exception as e:
                print(f"  ({b},{h},{w},{c})->{f} {name:5s} FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
