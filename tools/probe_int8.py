#!/usr/bin/env python
"""Probe: does this backend support int8 convolution / matmul natively?

Feasibility scout for a W8A8 quantized serving path (v5e int8 peak is 2×
bf16). Run on CPU (`env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu`) for
functional support and on the real chip for lowering support + timing.
Records: s8×s8→s32 conv_general_dilated, s8 dot_general, and a bf16
control, with per-op wall times (scan-of-K chained, scalar-fetch sync —
BENCH_NOTES methodology).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def _time(fn, *args, reps=3):
    fn(*args)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    B, H, W, C, K = 8, 128, 128, 128, 128
    x8 = rng.integers(-127, 127, (B, H, W, C)).astype(np.int8)
    w8 = rng.integers(-127, 127, (3, 3, C, K)).astype(np.int8)
    dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_s8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    @jax.jit
    def dot_s8(a, b):
        return jax.lax.dot_general(
            a.reshape(-1, C), b.reshape(-1, K)[:C],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    @jax.jit
    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)

    for name, fn, args in (("dot s8xs8->s32", dot_s8, (x8, w8)),
                           ("conv s8xs8->s32", conv_s8, (x8, w8)),
                           ("conv bf16 (control)", conv_bf16, (x8, w8))):
        try:
            ms = _time(fn, *args)
            print(f"  {name:24s} OK   {ms:8.3f} ms")
        except Exception as e:
            print(f"  {name:24s} FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
