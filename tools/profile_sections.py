#!/usr/bin/env python
"""Per-section TPU timing of the flagship train step (dev tool).

Uses the chained-carry + scalar-fetch sync methodology from BENCH_NOTES.md
(``jax.block_until_ready`` does not block through the axon tunnel). Each
measured function is iterated with a data dependency threaded through a
scalar carry so the iterations serialize; one scalar fetch at the end forces
completion, and the separately-measured fetch latency is subtracted.

Run:  python tools/profile_sections.py [--tile 512] [--bs 8] [--steps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unet_tpu.models import build_unet
from unet_tpu.models.layers import ConvLayer, PixelShuffleICNR
from unet_tpu.models.xresnet import XResNetBody
from unet_tpu.train.losses import cross_entropy


def _sync(x) -> float:
    return float(jax.device_get(x if x.ndim == 0 else x.ravel()[0]))


def _fetch_latency(x) -> float:
    _sync(x)
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(x)
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def time_fn(fn, args, steps=10, name="?"):
    """fn(carry, *args) -> new scalar carry. Returns ms/iter."""
    fn = jax.jit(fn)
    carry = jnp.zeros((), jnp.float32)
    for _ in range(2):
        carry = fn(carry, *args)
    lat = _fetch_latency(carry)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(carry, *args)
    _sync(carry)
    dt = (time.perf_counter() - t0 - lat) / steps
    print(f"{name:55s} {dt*1e3:8.2f} ms")
    return dt * 1e3


def conv_case(H, W, cin, cout, ks, stride, bs, dtype=jnp.bfloat16, bwd=True,
              steps=10, label=""):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((bs, H, W, cin)), dtype)
    k = jnp.asarray(np.random.default_rng(1).standard_normal((ks, ks, cin, cout)) * 0.05, dtype)
    p = (ks - 1) // 2

    def fwd(carry, x, k):
        xc = x + carry.astype(dtype) * 1e-12
        y = jax.lax.conv_general_dilated(
            xc, k, (stride, stride), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y[0, 0, 0].astype(jnp.float32))

    if not bwd:
        return time_fn(fwd, (x, k), steps, f"conv {label} {H}x{W} {cin}->{cout} k{ks}s{stride} fwd")

    def step(carry, x, k):
        def loss(k, x):
            return fwd(carry, x, k)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(k, x)
        return l + jnp.sum(g[0][0, 0, 0, 0]).astype(jnp.float32)

    return time_fn(step, (x, k), steps, f"conv {label} {H}x{W} {cin}->{cout} k{ks}s{stride} f+b")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--what", default="all")
    args = ap.parse_args()
    T, B = args.tile, args.bs
    S = args.steps
    print(f"devices: {jax.devices()}  tile={T} bs={B}", flush=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, T, T, 3)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, 3, (B, T, T)).astype(np.int32))

    if args.what in ("all", "model"):
        # ---- full model fwd and fwd+bwd ----
        model = build_unet("xresnet34", n_out=3, c_in=3, dtype=jnp.bfloat16)
        variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), images)
        params, bstats = variables["params"], variables["batch_stats"]

        def full_fwd(carry, params, bstats, x):
            xc = x + carry * 1e-12
            logits, _ = model.apply({"params": params, "batch_stats": bstats}, xc,
                                    train=True, mutable=["batch_stats"])
            return jnp.max(logits[0, 0, 0])

        time_fn(full_fwd, (params, bstats, images), S, "full model fwd (train mode)")

        def full_fb(carry, params, bstats, x, m):
            xc = x + carry * 1e-12

            def loss(params):
                logits, upd = model.apply({"params": params, "batch_stats": bstats}, xc,
                                          train=True, mutable=["batch_stats"])
                return cross_entropy(logits, m)

            l, g = jax.value_and_grad(loss)(params)
            leaf = jax.tree_util.tree_leaves(g)[0]
            return l + leaf.ravel()[0]

        time_fn(full_fb, (params, bstats, images, masks), S, "full model fwd+bwd+loss")

        # ---- encoder only ----
        enc = XResNetBody("xresnet34", 3, dtype=jnp.bfloat16)
        ev = jax.jit(partial(enc.init, train=False))(jax.random.PRNGKey(0), images)
        eparams, ebstats = ev["params"], ev["batch_stats"]

        def enc_fb(carry, p, bs_, x):
            xc = (x + carry * 1e-12).astype(jnp.bfloat16)

            def loss(p):
                (f, skips), _ = enc.apply({"params": p, "batch_stats": bs_}, xc,
                                          train=True, mutable=["batch_stats"])
                return (jnp.sum(f.astype(jnp.float32) ** 2) * 1e-6
                        + sum(jnp.sum(s.astype(jnp.float32)[:1, :1, :1]) for s in skips))

            l, g = jax.value_and_grad(loss)(p)
            leaf = jax.tree_util.tree_leaves(g)[0]
            return l + leaf.ravel()[0]

        time_fn(enc_fb, (eparams, ebstats, images), S, "encoder fwd+bwd (train mode)")

        def enc_fwd(carry, p, bs_, x):
            xc = (x + carry * 1e-12).astype(jnp.bfloat16)
            (f, skips), _ = enc.apply({"params": p, "batch_stats": bs_}, xc,
                                      train=True, mutable=["batch_stats"])
            return jnp.max(f).astype(jnp.float32)

        time_fn(enc_fwd, (eparams, ebstats, images), S, "encoder fwd (train mode)")

    if args.what in ("all", "convs"):
        # ---- the decoder's dominant convs (fwd+bwd) ----
        conv_case(T, T, 99, 99, 3, 1, B, steps=S, label="last_cross")
        conv_case(T, T, 128, 128, 3, 1, B, steps=S, label="aligned_tail")
        conv_case(T // 2, T // 2, 192, 96, 3, 1, B, steps=S, label="up3.c1")
        conv_case(T // 2, T // 2, 96, 96, 3, 1, B, steps=S, label="up3.c2")
        conv_case(T // 2, T // 2, 128, 128, 3, 1, B, steps=S, label="up3_aligned")
        conv_case(T // 4, T // 4, 256, 256, 3, 1, B, steps=S, label="up2")
        conv_case(T // 8, T // 8, 384, 384, 3, 1, B, steps=S, label="up1")
        conv_case(T // 16, T // 16, 512, 512, 3, 1, B, steps=S, label="up0")
        # stem
        conv_case(T, T, 3, 32, 3, 2, B, steps=S, label="stem0")
        conv_case(T // 4, T // 4, 12, 32, 2, 1, B, steps=S, label="stem0_s2d")

    if args.what in ("all", "overhead"):
        # bisect the ~27ms gap between fwd+bwd+loss and the bench train step
        import optax
        from unet_tpu.data.augment import AugmentConfig, augment_batch
        from unet_tpu.train.optimizer import one_cycle_adam

        model = build_unet("xresnet34", n_out=3, c_in=3, dtype=jnp.bfloat16)
        init_fn = jax.jit(partial(model.init, train=False))
        variables = init_fn(jax.random.PRNGKey(0), images)
        tx, _ = one_cycle_adam(variables["params"], 1e-4, total_steps=1000)
        opt_init = jax.jit(tx.init)
        key = jax.random.PRNGKey(1)

        def loss_fn(params, bstats, x, m):
            logits, upd = model.apply({"params": params, "batch_stats": bstats}, x,
                                      train=True, mutable=["batch_stats"])
            return cross_entropy(logits, m), upd["batch_stats"]

        def make_step(aug=True, opt=True, donate=True):
            def step(params, bstats, opt_state, x, m, key):
                if aug:
                    x, m = augment_batch(key, x, m, AugmentConfig())
                (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, bstats, x, m)
                if opt:
                    updates, opt_state2 = tx.update(g, opt_state, params)
                    params = optax.apply_updates(params, updates)
                else:
                    opt_state2 = opt_state
                return params, new_bs, opt_state2, l
            return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())

        def run_variant(name, step_fn):
            # fresh on-device state per variant (prior variant donated its away)
            v = init_fn(jax.random.PRNGKey(0), images)
            p, bs_ = v["params"], v["batch_stats"]
            o = opt_init(p)
            k = key
            for _ in range(2):
                k, sub = jax.random.split(k)
                p, bs_, o, l = step_fn(p, bs_, o, images, masks, sub)
            lat = _fetch_latency(l)
            t0 = time.perf_counter()
            for _ in range(S):
                k, sub = jax.random.split(k)
                p, bs_, o, l = step_fn(p, bs_, o, images, masks, sub)
            _sync(l)
            dt = (time.perf_counter() - t0 - lat) / S
            print(f"{name:55s} {dt*1e3:8.2f} ms")

        run_variant("train step (bench-identical)", make_step())
        run_variant("train step no-augment", make_step(aug=False))
        run_variant("train step no-optimizer", make_step(opt=False))
        run_variant("train step no-donate", make_step(donate=False))
        run_variant("train step no-aug no-opt", make_step(aug=False, opt=False))

    if args.what in ("all", "pieces"):
        # ---- memory-bound pieces at the full-res tail ----
        from unet_tpu.models.layers import pixel_shuffle, replication_blur
        x_tail = jnp.asarray(rng.standard_normal((B, T // 2, T // 2, 384)), jnp.bfloat16)

        def shuf(carry, x):
            y = pixel_shuffle(x + carry.astype(jnp.bfloat16) * 1e-12, 2)
            return jnp.max(y).astype(jnp.float32)

        time_fn(shuf, (x_tail,), S, f"pixel_shuffle {T//2}->{T} 384ch fwd")

        def shufblur(carry, x):
            y = replication_blur(pixel_shuffle(x + carry.astype(jnp.bfloat16) * 1e-12, 2))
            return jnp.max(y).astype(jnp.float32)

        time_fn(shufblur, (x_tail,), S, f"pixel_shuffle+blur {T//2}->{T} 384ch fwd")

        x99 = jnp.asarray(rng.standard_normal((B, T, T, 99)), jnp.bfloat16)

        def bn_train(carry, x):
            xc = x + carry.astype(jnp.bfloat16) * 1e-12
            m = jnp.mean(xc.astype(jnp.float32), axis=(0, 1, 2))
            v = jnp.mean(jnp.square(xc.astype(jnp.float32)), axis=(0, 1, 2)) - m ** 2
            y = (xc - m.astype(jnp.bfloat16)) * jax.lax.rsqrt(v + 1e-5).astype(jnp.bfloat16)
            return jnp.max(y).astype(jnp.float32)

        time_fn(bn_train, (x99,), S, f"BN-train stats+norm {T}x{T} 99ch fwd")

        def relu_copy(carry, x):
            return jnp.max(nn.relu(x + carry.astype(jnp.bfloat16) * 1e-12)).astype(jnp.float32)

        time_fn(relu_copy, (x99,), S, f"relu read+write {T}x{T} 99ch (HBM floor)")


if __name__ == "__main__":
    main()
