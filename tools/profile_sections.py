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
        opt_init = tx.init  # eager (donation aliasing)
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

        # K steps per dispatch via lax.scan: if per-dispatch overhead through
        # the axon tunnel is material, this collapses it
        K = 8

        def scan_steps(params, bstats, opt_state, x, m, key):
            def body(carry, k):
                params, bstats, opt_state = carry
                xa, ma = augment_batch(k, x, m, AugmentConfig())
                (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, bstats, xa, ma)
                updates, opt_state = tx.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, new_bs, opt_state), l

            keys = jax.random.split(key, K)
            (params, bstats, opt_state), losses = jax.lax.scan(
                body, (params, bstats, opt_state), keys)
            return params, bstats, opt_state, losses[-1]

        scan_jit = jax.jit(scan_steps, donate_argnums=(0, 1, 2))
        v = init_fn(jax.random.PRNGKey(0), images)
        p, bs_ = v["params"], v["batch_stats"]
        o = opt_init(p)
        k = key
        for _ in range(2):
            k, sub = jax.random.split(k)
            p, bs_, o, l = scan_jit(p, bs_, o, images, masks, sub)
        lat = _fetch_latency(l)
        t0 = time.perf_counter()
        n_disp = max(S // 2, 2)
        for _ in range(n_disp):
            k, sub = jax.random.split(k)
            p, bs_, o, l = scan_jit(p, bs_, o, images, masks, sub)
        _sync(l)
        dt = (time.perf_counter() - t0 - lat) / (n_disp * K)
        print(f"{'train step (scan x' + str(K) + ' per dispatch)':55s} {dt*1e3:8.2f} ms")

    if args.what in ("all", "tpuopt"):
        # A/B the tpu_opt model config (s2d stem + half-res tail) at the
        # bench config, scan-x4 per dispatch for low-variance numbers
        import optax
        from unet_tpu.data.augment import AugmentConfig, augment_batch
        from unet_tpu.train.optimizer import one_cycle_adam

        import os
        matrix_env = os.environ.get("TPUOPT_MATRIX", "")
        if matrix_env:
            matrix = [tuple(x.split(":")) for x in matrix_env.split(",")]
            matrix = [(f == "1", int(b), a == "1") for f, b, a in matrix]
        else:
            matrix = [(False, B, True), (False, B * 2, True),
                      (True, B, True), (True, B * 2, True)]
        for opt_flag, bs_try, aug_on in matrix:
            if True:
                try:
                    model = build_unet("xresnet34", n_out=3, c_in=3,
                                       tpu_opt=opt_flag, dtype=jnp.bfloat16)
                    imgs = jnp.asarray(rng.integers(
                        0, 255, (bs_try, T, T, 3)).astype(np.float32))
                    msks = jnp.asarray(rng.integers(
                        0, 3, (bs_try, T, T)).astype(np.int32))
                    init_fn = jax.jit(partial(model.init, train=False))
                    v = init_fn(jax.random.PRNGKey(0), imgs)
                    tx, _ = one_cycle_adam(v["params"], 1e-4, total_steps=1000)

                    def loss_fn(params, bstats, x, m):
                        logits, upd = model.apply(
                            {"params": params, "batch_stats": bstats}, x,
                            train=True, mutable=["batch_stats"])
                        return cross_entropy(logits, m), upd["batch_stats"]

                    K = 4

                    def scan_steps(params, bstats, opt_state, x, m, key):
                        def body(carry, k):
                            params, bstats, opt_state = carry
                            if aug_on:
                                xa, ma = augment_batch(k, x, m, AugmentConfig())
                            else:
                                xa, ma = x, m
                            (l, nb), g = jax.value_and_grad(loss_fn, has_aux=True)(
                                params, bstats, xa, ma)
                            updates, opt_state = tx.update(g, opt_state, params)
                            params = optax.apply_updates(params, updates)
                            return (params, nb, opt_state), l

                        keys = jax.random.split(key, K)
                        (params, bstats, opt_state), losses = jax.lax.scan(
                            body, (params, bstats, opt_state), keys)
                        return params, bstats, opt_state, losses[-1]

                    sj = jax.jit(scan_steps, donate_argnums=(0, 1, 2))
                    p, bs_ = v["params"], v["batch_stats"]
                    o = tx.init(p)
                    k = jax.random.PRNGKey(1)
                    for _ in range(2):
                        k, sub = jax.random.split(k)
                        p, bs_, o, l = sj(p, bs_, o, imgs, msks, sub)
                    lat = _fetch_latency(l)
                    t0 = time.perf_counter()
                    n_disp = 4
                    for _ in range(n_disp):
                        k, sub = jax.random.split(k)
                        p, bs_, o, l = sj(p, bs_, o, imgs, msks, sub)
                    _sync(l)
                    dt = (time.perf_counter() - t0 - lat) / (n_disp * K)
                    tps = bs_try / dt
                    print(f"tpu_opt={opt_flag} bs={bs_try} aug={aug_on}: {dt*1e3:7.2f} ms/step "
                          f"= {tps:6.1f} tiles/s", flush=True)
                except Exception as e:
                    print(f"tpu_opt={opt_flag} bs={bs_try} aug={aug_on}: FAILED {str(e)[:120]}",
                          flush=True)

    if args.what in ("all", "nobn"):
        # upper bound: what would the step cost with zero normalization?
        import optax
        from unet_tpu.data.augment import AugmentConfig, augment_batch
        from unet_tpu.train.optimizer import one_cycle_adam
        import unet_tpu.models.layers as L
        import unet_tpu.models.unet as U
        from typing import Any as _Any

        class NoBN(nn.Module):
            use_running_average: bool = True
            momentum: float = 0.9
            epsilon: float = 1e-5
            dtype: _Any = None
            param_dtype: _Any = None
            scale_init: _Any = None

            @nn.compact
            def __call__(self, x):
                return x

        orig = nn.BatchNorm
        L.nn.BatchNorm = NoBN
        U.nn.BatchNorm = NoBN
        try:
            BS = B * 2
            model = build_unet("xresnet34", n_out=3, c_in=3, tpu_opt=True,
                               dtype=jnp.bfloat16)
            imgs = jnp.asarray(rng.integers(0, 255, (BS, T, T, 3)).astype(np.float32))
            msks = jnp.asarray(rng.integers(0, 3, (BS, T, T)).astype(np.int32))
            v = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), imgs)
            tx, _ = one_cycle_adam(v["params"], 1e-4, total_steps=1000)

            def loss_fn(params, x, m):
                logits = model.apply({"params": params}, x, train=False)
                return cross_entropy(logits, m)

            K = 4

            def scan_steps(params, opt_state, x, m, key):
                def body(carry, k):
                    params, opt_state = carry
                    xa, ma = augment_batch(k, x, m, AugmentConfig())
                    l, g = jax.value_and_grad(loss_fn)(params, xa, ma)
                    updates, opt_state = tx.update(g, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), l

                keys = jax.random.split(key, K)
                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), keys)
                return params, opt_state, losses[-1]

            sj = jax.jit(scan_steps, donate_argnums=(0, 1))
            p = v["params"]
            o = tx.init(p)
            k = jax.random.PRNGKey(1)
            for _ in range(2):
                k, sub = jax.random.split(k)
                p, o, l = sj(p, o, imgs, msks, sub)
            lat = _fetch_latency(l)
            t0 = time.perf_counter()
            for _ in range(3):
                k, sub = jax.random.split(k)
                p, o, l = sj(p, o, imgs, msks, sub)
            _sync(l)
            dt = (time.perf_counter() - t0 - lat) / (3 * K)
            print(f"tpu_opt bs={BS} NO-BN step: {dt*1e3:7.2f} ms = {BS/dt:6.1f} t/s",
                  flush=True)
        finally:
            L.nn.BatchNorm = orig
            U.nn.BatchNorm = orig

    if args.what in ("all", "optstep"):
        # in-step optimizer variants on the tpu_opt bs16 config
        import optax
        from unet_tpu.data.augment import AugmentConfig, augment_batch
        from unet_tpu.train.optimizer import one_cycle_adam

        BS = B * 2
        model = build_unet("xresnet34", n_out=3, c_in=3, tpu_opt=True,
                           dtype=jnp.bfloat16)
        imgs = jnp.asarray(rng.integers(0, 255, (BS, T, T, 3)).astype(np.float32))
        msks = jnp.asarray(rng.integers(0, 3, (BS, T, T)).astype(np.int32))
        init_fn3 = jax.jit(partial(model.init, train=False))
        v0 = init_fn3(jax.random.PRNGKey(0), imgs)
        tx, _ = one_cycle_adam(v0["params"], 1e-4, total_steps=1000)

        def loss_fn(params, bstats, x, m):
            logits, upd = model.apply({"params": params, "batch_stats": bstats}, x,
                                      train=True, mutable=["batch_stats"])
            return cross_entropy(logits, m), upd["batch_stats"]

        K = 4

        def run_scan(name, body_tail, opt_state_init):
            def scan_steps(params, bstats, opt_state, x, m, key):
                def body(carry, k):
                    params, bstats, opt_state = carry
                    xa, ma = augment_batch(k, x, m, AugmentConfig())
                    (l, nb), g = jax.value_and_grad(loss_fn, has_aux=True)(
                        params, bstats, xa, ma)
                    params, opt_state, l2 = body_tail(params, opt_state, g, l)
                    return (params, nb, opt_state), l2

                keys = jax.random.split(key, K)
                (params, bstats, opt_state), losses = jax.lax.scan(
                    body, (params, bstats, opt_state), keys)
                return params, bstats, opt_state, losses[-1]

            try:
                sj = jax.jit(scan_steps, donate_argnums=(0, 1, 2))
                v = init_fn3(jax.random.PRNGKey(0), imgs)
                p, bs_ = v["params"], v["batch_stats"]
                o = opt_state_init(p)
                k = jax.random.PRNGKey(1)
                for _ in range(2):
                    k, sub = jax.random.split(k)
                    p, bs_, o, l = sj(p, bs_, o, imgs, msks, sub)
                lat = _fetch_latency(l)
                t0 = time.perf_counter()
                for _ in range(3):
                    k, sub = jax.random.split(k)
                    p, bs_, o, l = sj(p, bs_, o, imgs, msks, sub)
                _sync(l)
                dt = (time.perf_counter() - t0 - lat) / (3 * K)
                print(f"{name:55s} {dt*1e3:8.2f} ms/step = {BS/dt:6.1f} t/s",
                      flush=True)
            except Exception as e:
                print(f"{name:55s} FAILED {str(e)[:100]}", flush=True)

        def tail_none(params, opt_state, g, l):
            # consume EVERY grad leaf so no wgrad is DCE'd, but do no
            # optimizer math
            gl = jax.tree_util.tree_leaves(g)
            s = sum(x.ravel()[0] for x in gl)
            return params, opt_state, l + s * 1e-20

        run_scan("fwd+bwd only (grads kept)", tail_none, lambda p: jnp.zeros(()))

        def tail_flat(params, opt_state, g, l):
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

        run_scan("flat adam + per-leaf apply (current)", tail_flat,
                 lambda p: tx.init(p))

        otx = optax.adamw(1e-4, b1=0.9, b2=0.99, eps=1e-5, weight_decay=1e-6)

        def tail_optax(params, opt_state, g, l):
            updates, opt_state = otx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

        run_scan("stock optax.adamw (tree kernels)", tail_optax,
                 lambda p: jax.jit(otx.init)(p))

    if args.what in ("all", "optalone"):
        # the optimizer update in isolation: is it genuinely ~25 ms, and why?
        import optax
        from unet_tpu.train.optimizer import one_cycle_adam

        model = build_unet("xresnet34", n_out=3, c_in=3, dtype=jnp.bfloat16)
        init_fn2 = lambda: jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(0), images)["params"]
        params0 = init_fn2()
        tx, _ = one_cycle_adam(params0, 1e-4, total_steps=1000)
        n_leaves = len(jax.tree_util.tree_leaves(params0))
        n_params = sum(l.size for l in jax.tree_util.tree_leaves(params0))
        print(f"params: {n_leaves} leaves, {n_params/1e6:.1f} M elements", flush=True)

        def guarded(name, fn):
            try:
                fn()
            except Exception as e:
                print(f"{name:55s} FAILED: {str(e)[:120]}", flush=True)

        def case_tx():
            def opt_step(params, opt_state, carry):
                # grads standing in as params+carry (elementwise, ~free)
                grads = jax.tree_util.tree_map(lambda p: p * (1e-12 * carry + 1e-6), params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                leaf = jax.tree_util.tree_leaves(params)[0]
                return params, opt_state, leaf.ravel()[0]

            step_d = jax.jit(opt_step, donate_argnums=(0, 1))
            p, o = init_fn2(), None
            o = tx.init(p)
            carry = jnp.zeros((), jnp.float32)
            for _ in range(2):
                p, o, carry = step_d(p, o, carry)
            lat = _fetch_latency(carry)
            t0 = time.perf_counter()
            for _ in range(S):
                p, o, carry = step_d(p, o, carry)
            _sync(carry)
            print(f"{'optimizer update alone (tx, donated)':55s} "
                  f"{(time.perf_counter()-t0-lat)/S*1e3:8.2f} ms", flush=True)

        def case_flat_roofline():
            # pure flat adam math on one 41M vector: the roofline
            def flat_math(mu, nu, p, carry):
                g = p * (1e-12 * carry + 1e-6)
                mu = 0.9 * mu + 0.1 * g
                nu = 0.99 * nu + 0.01 * g * g
                p = p - 1e-4 * (mu / 0.5) / (jnp.sqrt(nu / 0.5) + 1e-5) - 1e-6 * p
                return mu, nu, p, p[0]

            fm = jax.jit(flat_math, donate_argnums=(0, 1, 2))
            mu = jnp.zeros((n_params,), jnp.float32)
            nu = jnp.zeros((n_params,), jnp.float32)
            pp = jnp.ones((n_params,), jnp.float32)
            carry = jnp.zeros((), jnp.float32)
            for _ in range(2):
                mu, nu, pp, carry = fm(mu, nu, pp, carry)
            lat = _fetch_latency(carry)
            t0 = time.perf_counter()
            for _ in range(S):
                mu, nu, pp, carry = fm(mu, nu, pp, carry)
            _sync(carry)
            print(f"{'flat adam math roofline (41M vec)':55s} "
                  f"{(time.perf_counter()-t0-lat)/S*1e3:8.2f} ms", flush=True)

        def case_tree():
            # round-1-style tree adam (per-leaf kernels) for comparison
            def tree_opt_step(params, mu, nu, carry):
                grads = jax.tree_util.tree_map(lambda p: p * (1e-12 * carry + 1e-6), params)
                mu = jax.tree_util.tree_map(lambda m, g: 0.9 * m + 0.1 * g, mu, grads)
                nu = jax.tree_util.tree_map(lambda v, g: 0.99 * v + 0.01 * g * g, nu, grads)
                params = jax.tree_util.tree_map(
                    lambda p, m, v: p - 1e-4 * (m / 0.5) / (jnp.sqrt(v / 0.5) + 1e-5),
                    params, mu, nu)
                leaf = jax.tree_util.tree_leaves(params)[0]
                return params, mu, nu, leaf.ravel()[0]

            ts = jax.jit(tree_opt_step, donate_argnums=(0, 1, 2))
            p = init_fn2()
            mu = jax.tree_util.tree_map(jnp.zeros_like, p)
            nu = jax.tree_util.tree_map(jnp.zeros_like, p)
            carry = jnp.zeros((), jnp.float32)
            for _ in range(2):
                p, mu, nu, carry = ts(p, mu, nu, carry)
            lat = _fetch_latency(carry)
            t0 = time.perf_counter()
            for _ in range(S):
                p, mu, nu, carry = ts(p, mu, nu, carry)
            _sync(carry)
            print(f"{'tree adam (per-leaf kernels, donated)':55s} "
                  f"{(time.perf_counter()-t0-lat)/S*1e3:8.2f} ms", flush=True)

        guarded("flat roofline", case_flat_roofline)
        guarded("tree adam", case_tree)
        guarded("tx optimizer", case_tx)

    if args.what in ("all", "encoder"):
        # encoder internals: where do 11.9 ms f+b go on ~0.46 TF?
        from unet_tpu.models.layers import avg_pool_ceil, max_pool_torch

        def fb(f):
            """wrap a bf16 function into a fwd+bwd timing target"""
            def step(carry, x, *rest):
                xc = (x + carry.astype(x.dtype) * 1e-12)

                def loss(xc):
                    return jnp.sum(f(xc, *rest).astype(jnp.float32) ** 2) * 1e-9

                l, g = jax.value_and_grad(loss)(xc)
                return (l + g.ravel()[0]).astype(jnp.float32)
            return step

        x512 = jnp.asarray(rng.standard_normal((B, T, T, 3)), jnp.bfloat16)
        x256_64 = jnp.asarray(rng.standard_normal((B, T // 2, T // 2, 64)), jnp.bfloat16)
        x128_64 = jnp.asarray(rng.standard_normal((B, T // 4, T // 4, 64)), jnp.bfloat16)

        stem = XResNetBody("xresnet34", 3, dtype=jnp.bfloat16)

        def stem_only(x, p, bs_):
            # run just the 3 stem convs + pool via the body's submodules
            return x  # placeholder (not used)

        time_fn(fb(lambda x: max_pool_torch(x, 3, 2)), (x256_64,), S,
                "maxpool 256->128 64ch f+b")
        time_fn(fb(lambda x: avg_pool_ceil(x, 2)), (x128_64,), S,
                "avg_pool_ceil 128->64 64ch f+b")

        def bn_train_f(x):
            m = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
            v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2)) - m ** 2
            return (x - m.astype(x.dtype)) * jax.lax.rsqrt(v + 1e-5).astype(x.dtype)

        time_fn(fb(bn_train_f), (x256_64,), S, "BN-train 256x256 64ch f+b")

        # full encoder, eval mode (running stats) for BN-cost comparison
        enc = XResNetBody("xresnet34", 3, dtype=jnp.bfloat16)
        ev = jax.jit(partial(enc.init, train=False))(jax.random.PRNGKey(0), images)

        def enc_eval_fb(carry, v, x):
            xc = (x + carry * 1e-12)

            def loss(xc):
                f, skips = enc.apply(v, xc.astype(jnp.bfloat16), train=False)
                return jnp.sum(f.astype(jnp.float32) ** 2) * 1e-6

            l, g = jax.value_and_grad(loss)(xc)
            return l + g.ravel()[0]

        time_fn(enc_eval_fb, (ev, images), S, "encoder fwd+bwd (eval mode, running stats)")

    if args.what in ("all", "shuffle"):
        # pixel-shuffle formulations at the expensive tail shape
        from unet_tpu.models.layers import pixel_shuffle, replication_blur

        cin, cout = 256, 128  # up_3's shuffle: 256ch @128 -> 128ch @256
        Hs = T // 4
        x = jnp.asarray(rng.standard_normal((B, Hs, Hs, cin)), jnp.bfloat16)
        k1 = jnp.asarray(rng.standard_normal((1, 1, cin, cout * 4)) * 0.05, jnp.bfloat16)
        kt = jnp.asarray(rng.standard_normal((2, 2, cin, cout)) * 0.05, jnp.bfloat16)

        def conv_shuffle(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return pixel_shuffle(jax.nn.relu(y), 2)

        def conv_transpose_up(x, k):
            # fractionally-strided conv: same math as 1x1conv+shuffle with
            # rearranged weights, one fused op
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 0), (1, 0)], lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.relu(y)

        def fb2(f):
            def step(carry, x, k):
                xc = x + carry.astype(x.dtype) * 1e-12

                def loss(xc, k):
                    return jnp.sum(f(xc, k).astype(jnp.float32) ** 2) * 1e-9

                l, g = jax.value_and_grad(loss, argnums=(0, 1))(xc, k)
                return (l + g[0].ravel()[0]).astype(jnp.float32)
            return step

        time_fn(fb2(conv_shuffle), (x, k1), S,
                f"1x1conv+pixelshuffle {cin}->{cout} @{Hs} f+b")
        time_fn(fb2(conv_transpose_up), (x, kt), S,
                f"conv_transpose k2 s2 {cin}->{cout} @{Hs} f+b")
        time_fn(fb2(lambda x, k: replication_blur(conv_shuffle(x, k))), (x, k1), S,
                f"1x1conv+shuffle+blur {cin}->{cout} @{Hs} f+b")

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
