#!/bin/bash
# One-shot real-chip validation sequence, fired by the tunnel-recovery
# poller (or by hand) after an axon outage. Everything is serialized —
# this box has ONE core — and individually timeboxed. Results append to
# /tmp/realchip_run.log; durable numbers get copied into BENCH_NOTES.md
# by hand afterwards.
set -u
cd /root/repo
{
  echo "=== real-chip validation $(date -u +%FT%TZ) ==="
  echo "--- bench.py (headline + detail incl. scaling/pallas blocks) ---"
  timeout 3600 python bench.py
  echo "--- int8 conv/matmul probe on the chip ---"
  timeout 1800 python tools/probe_int8.py
  echo "--- tpu_opt bs sweep (current topology) ---"
  for bs in 24 32; do
    timeout 1800 python -c "
import sys, json
sys.path.insert(0, '.')
from unet_tpu.bench import bench_train
try:
    r = bench_train(tile=512, batch_size=$bs, steps=24)
    print('BS_SWEEP', json.dumps({k: (round(v,3) if isinstance(v,float) else v) for k,v in r.items()}))
except Exception as e:
    print('BS_SWEEP bs=$bs FAILED:', e)
"
  done
  echo "--- flagship quality on the chip (ties bench to mIoU) ---"
  timeout 5400 python tools/realchip_quality.py --epochs 12
  echo "=== done $(date -u +%FT%TZ) ==="
} >> /tmp/realchip_run.log 2>&1
