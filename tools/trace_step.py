#!/usr/bin/env python
"""Capture a perfetto trace of the flagship train step and print a per-op
cost breakdown (dev tool).

The axon platform supports ``jax.profiler.start_trace(...,
create_perfetto_trace=True)``; the resulting JSON's ``traceEvents`` carry
per-op device timings under the TPU pid. This groups them by category and
prints the top ops so optimization targets are named, not guessed.

Run:  python tools/trace_step.py [--bs 16] [--scan 4] [--mode train]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unet_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # the remote compile service stalls for minutes at
# times (BENCH_NOTES session 6); cached executables make traces repeatable

from unet_tpu.data.augment import AugmentConfig, augment_batch
from unet_tpu.models import build_unet
from unet_tpu.train.losses import cross_entropy
from unet_tpu.train.optimizer import one_cycle_adam


def _sync(x):
    return float(jax.device_get(x if x.ndim == 0 else x.ravel()[0]))


META = re.compile(r"^(jit_|while|body|cond|\d+$)")


def categorize(name: str) -> str:
    if META.search(name):
        return "META"
    if name.startswith(("copy", "bitcast")):
        return "copy"
    if "convolution" in name:
        return "conv+fused"
    if "reduce" in name:
        return "reduce+fused"
    if "select" in name and "scatter" in name:
        return "select-scatter"
    if name.startswith(("rev", "transpose")):
        return "rev/transpose"
    if name.startswith("dynamic"):
        return "dynamic-slice"
    if "fusion" in name:
        return "fusion-elementwise"
    return "other"


def load_trace_events(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    paths += glob.glob(os.path.join(trace_dir, "**", "*.trace.json"),
                       recursive=True)
    if not paths:
        raise FileNotFoundError(f"no perfetto trace under {trace_dir}")
    p = max(paths, key=os.path.getmtime)
    op = gzip.open if p.endswith(".gz") else open
    with op(p, "rt") as f:
        return json.load(f)["traceEvents"]


def device_ops(events):
    # find TPU device pids from process_name metadata
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e.get("args", {}).get("name", "")):
                tpu_pids.add(e["pid"])
    ops = [e for e in events
           if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e]
    return ops


def report(ops, n_steps, label, top=28):
    ops = [o for o in ops if categorize(o["name"]) != "META"]
    total = sum(o["dur"] for o in ops) / 1e3 / n_steps
    by_cat = defaultdict(lambda: [0.0, 0])
    by_name = defaultdict(lambda: [0.0, 0])
    for o in ops:
        c = categorize(o["name"])
        by_cat[c][0] += o["dur"] / 1e3 / n_steps
        by_cat[c][1] += 1
        by_name[o["name"]][0] += o["dur"] / 1e3 / n_steps
        by_name[o["name"]][1] += 1
    print(f"\n== {label}: {total:.2f} ms/step device-busy ==")
    for c, (ms, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"  {c:16s} {ms:8.2f} ms  {n / n_steps:7.1f} ops/step")
    print(f"  -- top {top} ops --")
    for name, (ms, n) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {ms:7.3f} ms  x{n // n_steps:<4d} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--single", action="store_true",
                    help="also trace a single-dispatch step")
    ap.add_argument("--no-tpu-opt", action="store_true")
    args = ap.parse_args()
    B, T = args.bs, args.tile

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, T, T, 3)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, 3, (B, T, T)).astype(np.int32))
    model = build_unet("xresnet34", n_out=3, c_in=3, dtype=jnp.bfloat16,
                       tpu_opt=not args.no_tpu_opt)
    init_fn = jax.jit(partial(model.init, train=False))
    v = init_fn(jax.random.PRNGKey(0), images)
    tx, _ = one_cycle_adam(v["params"], 1e-4, total_steps=1000)

    def loss_fn(params, bstats, x, m):
        logits, upd = model.apply({"params": params, "batch_stats": bstats}, x,
                                  train=True, mutable=["batch_stats"])
        return cross_entropy(logits, m), upd["batch_stats"]

    K = args.scan

    def scan_steps(params, bstats, opt_state, x, m, key):
        def body(carry, k):
            params, bstats, opt_state = carry
            xa, ma = augment_batch(k, x, m, AugmentConfig())
            (l, nb), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bstats, xa, ma)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, nb, opt_state), l

        keys = jax.random.split(key, K)
        (params, bstats, opt_state), losses = jax.lax.scan(
            body, (params, bstats, opt_state), keys)
        return params, bstats, opt_state, losses[-1]

    def single_step(params, bstats, opt_state, x, m, key):
        xa, ma = augment_batch(key, x, m, AugmentConfig())
        (l, nb), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats, xa, ma)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, nb, opt_state, l

    for label, fn, n_per_disp in (
        [(f"scan x{K}", jax.jit(scan_steps, donate_argnums=(0, 1, 2)), K)]
        + ([("single", jax.jit(single_step, donate_argnums=(0, 1, 2)), 1)]
           if args.single else [])
    ):
        v = init_fn(jax.random.PRNGKey(0), images)
        p, bs_ = v["params"], v["batch_stats"]
        o = tx.init(p)
        key = jax.random.PRNGKey(1)
        for _ in range(2):
            key, sub = jax.random.split(key)
            p, bs_, o, l = fn(p, bs_, o, images, masks, sub)
        _sync(l)
        with tempfile.TemporaryDirectory() as td:
            jax.profiler.start_trace(td, create_perfetto_trace=True)
            n_disp = 2
            for _ in range(n_disp):
                key, sub = jax.random.split(key)
                p, bs_, o, l = fn(p, bs_, o, images, masks, sub)
            _sync(l)
            jax.profiler.stop_trace()
            ops = device_ops(load_trace_events(td))
        import pickle

        with open(f"/tmp/trace_ops_{label.split()[0]}.pkl", "wb") as f:
            pickle.dump((ops, n_disp * n_per_disp), f)
        report(ops, n_disp * n_per_disp, f"{label} bs{B} tpu_opt={not args.no_tpu_opt}")


if __name__ == "__main__":
    main()
