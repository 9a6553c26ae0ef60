#!/usr/bin/env python
"""Repo benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures xresnet34-DynamicUnet training throughput at 512×512 (the
BASELINE.md north-star config: ≥2× an A100-estimate of 100 tiles/s/chip)
plus prediction megapixels/sec as detail on stderr.
"""

import sys

sys.path.insert(0, ".")

from unet_tpu.bench import run_benchmark  # noqa: E402

if __name__ == "__main__":
    run_benchmark()
