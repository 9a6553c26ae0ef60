#!/usr/bin/env python
"""A/B per-compile XLA compiler options on the headline train step.

Env-level XLA_FLAGS may not reach the axon REMOTE compiler; per-compile
``compiler_options`` ride the compile request itself, so this is the only
reliable way to probe TPU compiler knobs on this rig. Each option set is
compiled from the same lowered HLO and timed as scan-of-K with the
scalar-fetch latency subtracted (BENCH_NOTES timing methodology).

Run with the tunnel up and nothing else on the chip:
    python tools/ab_xla_options.py [--parity] [--batch-size 24]
"""
import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

CANDIDATES = [
    ("baseline", {}),
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    ("aggressive_opt", {"xla_tpu_enable_aggressive_loop_fusion": "true"}),
    ("flash_vmem", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
]


def main_inner(args):
    from unet_tpu.bench import _fetch_latency, _sync, cross_entropy, fold_loss_layout
    from unet_tpu.data.augment import AugmentConfig, augment_batch
    from unet_tpu.models.unet import build_unet
    from unet_tpu.train.optimizer import one_cycle_adam

    tpu_opt = not args.parity
    bs, tile, scan_k = args.batch_size, args.tile, args.scan_k
    model = build_unet("xresnet34", n_out=3, c_in=3, dtype=jnp.bfloat16,
                       tpu_opt=tpu_opt)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, tile, tile, 3)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, 3, (bs, tile, tile)).astype(np.int32))
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), images)
    tx, _ = one_cycle_adam(variables["params"], 1e-4, total_steps=1000)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    def loss_fn(p, bstats, x, m):
        logits, updates = model.apply(
            {"params": p, "batch_stats": bstats}, x,
            train=True, fold_logits=True, mutable=["batch_stats"])
        if logits.shape[1] != m.shape[1]:
            logits, m = fold_loss_layout(logits, m)
        return cross_entropy(logits, m), updates["batch_stats"]

    def scan_steps(p, bstats, opt, x, m, key):
        def body(carry, k):
            p, bstats, opt = carry
            xa, ma = augment_batch(k, x, m, AugmentConfig())
            (l, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bstats, xa, ma)
            upd, opt = tx.update(g, opt, p)
            p = optax.apply_updates(p, upd)
            return (p, nbs, opt), l
        keys = jax.random.split(key, scan_k)
        (p, bstats, opt), losses = jax.lax.scan(body, (p, bstats, opt), keys)
        return p, bstats, opt, losses[-1]

    lowered = jax.jit(scan_steps).lower(
        params, batch_stats, opt_state, images, masks, jax.random.PRNGKey(1))

    results = {}
    for name, opts in CANDIDATES:
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{name:18s} REJECTED: {str(e)[:140]}", flush=True)
            continue
        key = jax.random.PRNGKey(1)
        p, bstats, opt = params, batch_stats, opt_state
        out = compiled(p, bstats, opt, images, masks, key)  # warm
        _sync(out[3])
        lat = _fetch_latency(out[3])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            o = compiled(params, batch_stats, opt_state, images, masks, key)
            _sync(o[3])
            best = min(best, (time.perf_counter() - t0 - lat) / scan_k * 1e3)
        tps = bs / (best / 1e3)
        results[name] = best
        print(f"{name:18s} {best:7.2f} ms/step  {tps:6.1f} t/s  "
              f"(compile {compile_s:.0f}s)", flush=True)

    if "baseline" in results:
        base = results["baseline"]
        for name, ms in results.items():
            if name != "baseline":
                print(f"{name:18s} vs baseline: {100 * (base - ms) / base:+.1f}%")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--scan-k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    main_inner(ap.parse_args())
