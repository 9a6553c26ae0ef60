#!/usr/bin/env python
"""Pre-warm bench sections: run each section standalone with a generous
timeout so its executable lands in the persistent XLA compile cache and its
result lands in the last-known-good cache (utils/bench_lkg.py) under
EXACTLY the key the driver bench uses (VERDICT r4 next-#1: every section
reports a number every round, any weather).

The driver bench squeezes per-section timeouts to protect its global
budget; a cold compile through the axon compile service can exceed any
fair slice. This tool gives one section at a time the whole clock.

Usage (idle machine):
    python tools/bench_warm.py                 # all sections
    python tools/bench_warm.py predict serving # just these
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# (name, fn, kwargs) — kwargs MUST mirror unet_tpu/bench.py::run_benchmark
SECTIONS = {
    "headline": ("bench_train", dict(tile=512, batch_size=24, steps=24)),
    "train_parity_topology": (
        "bench_train", dict(tile=512, batch_size=16, steps=24, tpu_opt=False)),
    "predict": ("bench_predict", dict(tile=512, batch_size=64, steps=24)),
    "serving": ("bench_serving", dict(tile=512)),
    "loader": ("bench_loader", {}),
    "e2e_train": ("bench_e2e_train", dict(tile=512, batch_size=16)),
    "pallas": ("bench_pallas_probe", dict(tile=512)),
}


def warm(name: str, timeout: int) -> dict:
    from unet_tpu.utils import bench_lkg

    if name == "scaling":
        env = {**os.environ, "JAX_PLATFORMS": "cpu",
               "UNET_TPU_COMPILE_CACHE": "off"}
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        try:
            out = subprocess.run(
                [sys.executable, "-m", "unet_tpu.bench_scaling"], cwd=ROOT,
                env=env, capture_output=True, text=True, timeout=timeout)
            if out.returncode != 0:
                tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
                return {"error": f"rc={out.returncode}: " + " | ".join(tail)[:300]}
            res = json.loads(out.stdout.strip().splitlines()[-1])
        except subprocess.TimeoutExpired:
            return {"error": f"timeout after {timeout}s"}
        bench_lkg.store("scaling", {}, res)
        return res
    fn_name, kwargs = SECTIONS[name]
    code = (
        "import sys, json; sys.path.insert(0, '.')\n"
        "from unet_tpu.utils.compile_cache import enable_compile_cache\n"
        "enable_compile_cache()\n"
        "import unet_tpu.bench as b\n"
        f"r = getattr(b, {fn_name!r})(**{kwargs!r})\n"
        "print('RESULT ' + json.dumps(r))\n"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                             capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout}s"}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
            # the headline is keyed by tile only in run_benchmark (the
            # batch size can ladder down, the LKG key must not)
            key = {"tile": kwargs["tile"]} if name == "headline" else kwargs
            bench_lkg.store(name, key, res)
            return res
    tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
    return {"error": f"rc={out.returncode}: " + " | ".join(tail)[:300]}


def main() -> None:
    names = sys.argv[1:] or list(SECTIONS) + ["scaling"]
    timeout = int(os.environ.get("UNET_TPU_WARM_TIMEOUT", "2400"))
    for name in names:
        r = warm(name, timeout)
        line = {"section": name, **(r if isinstance(r, dict) else {"v": r})}
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
