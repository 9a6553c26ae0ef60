"""Tracing and step-time observability.

The reference's only timing is whole-run wall clock
(params_and_main.py:126,179-180); SURVEY.md §5 calls for first-class
profiling in the rebuild: ``jax.profiler`` trace capture (viewable in
XProf/TensorBoard) plus a lightweight per-phase step timer with percentile
summaries.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import numpy as np


class StepTimer:
    """Accumulates wall-time samples per phase; cheap enough to always run."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "count": int(a.size),
                "total_s": float(a.sum()),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
            }
        return out

    def report(self) -> str:
        rows = ["phase                 count   total_s   mean_ms    p50_ms    p95_ms"]
        for name, s in sorted(self.summary().items()):
            rows.append(
                f"{name:<20} {s['count']:>6} {s['total_s']:>9.2f} "
                f"{s['mean_ms']:>9.2f} {s['p50_ms']:>9.2f} {s['p95_ms']:>9.2f}"
            )
        return "\n".join(rows)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace capture when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield
