#!/usr/bin/env python
"""Attribute traced device time to model sections (dev tool).

Reads the pickle dumped by trace_step.py and groups per-op device time by
the JAX op path (tf_op), yielding a section × direction cost matrix plus
achieved-FLOPs / achieved-bandwidth per expensive op.

Run:  python tools/trace_attr.py [/tmp/trace_ops_scan.pkl]
"""

import pickle
import re
import sys
from collections import defaultdict

PEAK_TF = 197.0  # v5e bf16 peak
PEAK_GBS = 819.0  # v5e HBM


def section_of(tf_op: str, src: str) -> str:
    # strip jit wrapper prefixes
    t = re.sub(r"^jit\([^)]*\)/", "", tf_op)
    t = re.sub(r"^(while/body/)?(closed_call/)?", "", t)
    direction = "bwd" if "transpose(jvp" in t else ("fwd" if "jvp(" in t else "-")
    m = re.search(r"jvp\(DynamicUnet\)\)?/([^/]+)(?:/([^/]+))?", t)
    if m:
        sec = m.group(1)
        if sec == "encoder" and m.group(2):
            sec = "enc." + re.sub(r"_block_\d+", "", m.group(2))
        return f"{sec}:{direction}"
    if "_augment" in t or "augment" in (src or ""):
        return "augment"
    if "optimizer" in (src or "") or re.search(r"(scan_steps|single_step)/(while/body/)?(closed_call/)?(mul|add|sub|div|sqrt|integer_pow|pow)", t):
        return "optimizer/other-math"
    if "cross_entropy" in (src or "") or "losses" in (src or ""):
        return "loss"
    return "misc"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_ops_scan.pkl"
    ops, n_steps = pickle.load(open(path, "rb"))
    meta = re.compile(r"^(jit_|while|body|cond|\d+$)")
    by_sec = defaultdict(lambda: [0.0, 0])
    rows = []
    for o in ops:
        if meta.search(o["name"]):
            continue
        a = o.get("args", {})
        dur_ms = o["dur"] / 1e3 / n_steps
        sec = section_of(a.get("tf_op", ""), a.get("source", ""))
        by_sec[sec][0] += dur_ms
        by_sec[sec][1] += 1
        rows.append((dur_ms, o["name"], a))

    total = sum(v[0] for v in by_sec.values())
    print(f"total device-busy: {total:.2f} ms/step over {n_steps} steps\n")
    print("== by section ==")
    for sec, (ms, n) in sorted(by_sec.items(), key=lambda kv: -kv[1][0]):
        print(f"  {sec:32s} {ms:8.2f} ms  {n/n_steps:8.1f} ops")

    # collapse duplicate op instances (scan unrolls? no — same name repeats
    # across dispatches); aggregate by name
    agg = defaultdict(lambda: [0.0, 0, None])
    for dur, name, a in rows:
        agg[name][0] += dur
        agg[name][1] += 1
        agg[name][2] = a
    print("\n== top 40 ops (ms | TF/s | GB/s | section | jax op | src) ==")
    for name, (ms, n, a) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        fl = float(a.get("model_flops", 0) or 0)
        byts = float(a.get("bytes_accessed", 0) or 0)
        reps = n / n_steps
        tfs = fl * reps / (ms * 1e-3) / 1e12 if fl else 0
        gbs = byts * reps / (ms * 1e-3) / 1e9 if byts else 0
        sec = section_of(a.get("tf_op", ""), a.get("source", ""))
        op_tail = a.get("tf_op", "").split("/")[-1][:36]
        src = (a.get("source", "") or "").split("/")[-1]
        print(f"  {ms:7.3f} {tfs:6.1f} {gbs:6.0f}  {sec:24s} {op_tail:36s} {src}")


if __name__ == "__main__":
    main()
