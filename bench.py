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


if __name__ == "__main__":
    if not _backend_reachable():
        print(json.dumps({
            "metric": "train_tiles_per_sec_per_chip_512", "value": 0,
            "unit": "tiles/s/chip", "vs_baseline": 0,
            "error": f"TPU backend unreachable (device bring-up exceeded "
                     f"{PROBE_TIMEOUT_S}s — axon tunnel down?); last "
                     "recorded real-chip number: 253.2 (BENCH_NOTES.md)",
        }))
        sys.exit(1)
    from unet_tpu.bench import run_benchmark

    try:
        run_benchmark()
    except Exception as e:  # mid-run outage (canary exhausted the budget)
        print(json.dumps({
            "metric": "train_tiles_per_sec_per_chip_512", "value": 0,
            "unit": "tiles/s/chip", "vs_baseline": 0,
            "error": str(e)[:200] + " — last recorded real-chip number: "
                     "253.2 (BENCH_NOTES.md)",
        }))
        sys.exit(1)
