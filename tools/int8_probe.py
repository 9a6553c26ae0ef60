"""Probe: does this toolchain run int8 convolutions faster than bf16?

v5e-class MXUs advertise ~2x int8 throughput over bf16
(394 TOPS vs 197 TFLOP/s class). Whether jax/XLA on THIS toolchain
actually lowers an s8 x s8 -> s32 convolution onto the int8 MXU path —
rather than upcasting — decides if a quantized serving path is worth
building. This measures representative DynamicUnet decoder/encoder conv
shapes in bf16 vs int8 and prints ms + effective TOP/s for each.

Usage: python tools/int8_probe.py [--tile 256] [--batch 8]
"""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def conv_fn(x, k, out_dtype):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def bench_one(b, h, w, cin, cout, dtype, out_dtype, reps=30):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (b, h, w, cin)), jnp.int8)
        k = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)
    else:
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), dtype)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), dtype)

    f = jax.jit(partial(conv_fn, out_dtype=out_dtype))
    # scan-of-K to amortize dispatch through the tunnel
    K = 20

    @jax.jit
    def scanned(x, k):
        def body(c, _):
            y = f(c, k)
            # feed back a same-shape, same-dtype view so iterations chain
            c2 = y[..., :cin].astype(dtype) if out_dtype != dtype else y[..., :cin]
            return c2, jnp.sum(y[0, 0, 0, :1])
        return jax.lax.scan(body, x, None, length=K)[1]

    r = scanned(x, k)
    r.block_until_ready()
    best = float("inf")
    for _ in range(reps // 10):
        t0 = time.perf_counter()
        r = scanned(x, k)
        r.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / K)
    flops = 2 * b * h * w * cin * cout * 9
    return best * 1e3, flops / best / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tile", type=int, default=256)
    args = ap.parse_args()

    shapes = [
        # (h, w, cin, cout) — tpu_opt decoder stages at tile=512 bs-normalized
        (args.tile // 2, args.tile // 2, 128, 128),
        (args.tile // 4, args.tile // 4, 256, 256),
        (args.tile // 8, args.tile // 8, 384, 384),
        (args.tile // 16, args.tile // 16, 512, 512),
    ]
    print(f"devices: {jax.devices()}")
    for h, w, cin, cout in shapes:
        ms_bf, tf_bf = bench_one(args.batch, h, w, cin, cout,
                                 jnp.bfloat16, jnp.float32)
        ms_i8, tf_i8 = bench_one(args.batch, h, w, cin, cout,
                                 jnp.int8, jnp.int32)
        print(f"({args.batch},{h},{w},{cin})->{cout}: "
              f"bf16 {ms_bf:7.3f} ms ({tf_bf:5.1f} TF/s) | "
              f"int8 {ms_i8:7.3f} ms ({tf_i8:5.1f} TOP/s) | "
              f"speedup {ms_bf / ms_i8:4.2f}x")


if __name__ == "__main__":
    main()
