#!/usr/bin/env python
"""On-chip A/B of BatchNorm variants at the flagship bench config.

Round-4 trace: BN-stat reduces are 23.3 ms of the 94.6 ms flagship step
(25%). ``UNET_TPU_BN=slice:k`` (models/layers.py::SliceStatsBatchNorm)
computes training statistics from the first k samples only, shrinking the
forward stat-reduce reads to k/N of the tensor. This tool measures what
that buys at step level on the real chip: each variant runs
``bench.bench_train`` in its own subprocess (fresh jit cache, env-selected
variant), and the verdict table lands in BENCH_NOTES.md.

Usage (idle machine — never share the axon grant with another client):
    python tools/ab_bn_variant.py [--variants ,slice:8,slice:4,slice:2]
    python tools/ab_bn_variant.py --batch-size 24 --steps 24
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_variant(variant: str, tile: int, batch_size: int, steps: int,
                timeout: int) -> dict:
    code = (
        "import sys, json; sys.path.insert(0, '.')\n"
        "from unet_tpu.bench import bench_train\n"
        f"r = bench_train(tile={tile}, batch_size={batch_size}, steps={steps})\n"
        "print('RESULT ' + json.dumps(r))\n"
    )
    env = dict(os.environ)
    if variant:
        env["UNET_TPU_BN"] = variant
    else:
        env.pop("UNET_TPU_BN", None)
    try:
        out = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                             env=env, capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout}s"}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
    return {"error": f"rc={out.returncode}: " + " | ".join(tail)[:300]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",slice:8,slice:4,slice:2",
                    help="comma-separated UNET_TPU_BN values; empty = flax")
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    # every subprocess joins the same persistent XLA compile cache
    sys.path.insert(0, str(ROOT))
    from unet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    results = {}
    base_ms = None
    for v in args.variants.split(","):
        label = v or "flax"
        r = run_variant(v, args.tile, args.batch_size, args.steps,
                        args.timeout)
        results[label] = r
        if "error" in r:
            print(f"{label:>10}: ERROR {r['error']}", flush=True)
            continue
        if base_ms is None:
            base_ms = r["step_ms"]
        print(f"{label:>10}: {r['step_ms']:7.2f} ms/step  "
              f"{r['tiles_per_sec_per_chip']:7.2f} t/s/chip  "
              f"({base_ms / r['step_ms']:.3f}x vs {args.variants.split(',')[0] or 'flax'})",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
