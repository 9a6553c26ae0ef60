"""Last-known-good (LKG) cache for benchmark sections.

The remote axon compile service stalls for tens of minutes at times
(BENCH_NOTES round 3/4: identical programs compiled in ~100 s hours apart
from >40 min stalls). The bench already subprocess-guards every section so
a stall costs a bounded timeout — but the timed-out section then reported
an *error* instead of a number, and BENCH_r04.json lost 4 of 7 sections to
one bad compile-weather window (VERDICT r4 weak #1).

This module makes every section report a NUMBER every round: each
successful section run persists its result here, keyed by (section name,
config kwargs), stamped with a content hash of the package source; when a
later run of the same section fails or times out, the most recent measured
result is reported with explicit staleness markers instead of an error::

    {"...measured keys...",
     "stale": "2026-08-20T12:00:00Z",   # when the LKG value was measured
     "stale_error": "<why this round's fresh attempt failed>",
     "stale_code": true}                # only if the source tree changed
                                        # since the LKG measurement

A consumer that wants only fresh numbers filters on ``"stale" in d``; a
consumer that wants continuity (the driver's per-round BENCH artifact)
always has the latest measured value. Results that already carry
``stale``/``error`` keys are never stored, so staleness cannot compound.

The cache file lives next to the persistent XLA compile cache
(``~/.cache/unet_tpu/bench_lkg.json``; override dir with
``UNET_TPU_BENCH_LKG_DIR``, disable with ``UNET_TPU_BENCH_LKG=off``).
Writes are atomic (tmp + rename); the bench runs sections sequentially so
there are no concurrent writers. This module imports neither jax nor
numpy — the repo-root ``bench.py`` reads it before any backend bring-up
to report a stale headline when the TPU tunnel itself is down.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path
from typing import Optional

_CODE_HASH: Optional[str] = None


def _enabled() -> bool:
    return os.environ.get("UNET_TPU_BENCH_LKG", "").lower() not in (
        "0", "off", "false", "none")


def cache_file() -> Path:
    d = os.environ.get("UNET_TPU_BENCH_LKG_DIR") or str(
        Path.home() / ".cache" / "unet_tpu")
    return Path(d) / "bench_lkg.json"


def code_hash() -> str:
    """Content hash of the package's Python sources (+ the native C++),
    so a stale result can be flagged when the code it measured changed."""
    global _CODE_HASH
    if _CODE_HASH is None:
        root = Path(__file__).resolve().parents[1]
        h = hashlib.sha256()
        for pattern in ("*.py", "*.cpp"):
            for p in sorted(root.rglob(pattern)):
                h.update(str(p.relative_to(root)).encode())
                try:
                    h.update(p.read_bytes())
                except OSError:
                    pass
        _CODE_HASH = h.hexdigest()[:16]
    return _CODE_HASH


def _key(section: str, kwargs: Optional[dict]) -> str:
    return f"{section}|{json.dumps(kwargs or {}, sort_keys=True, default=str)}"


def _load_all() -> dict:
    try:
        return json.loads(cache_file().read_text())
    except (OSError, ValueError):
        return {}


def store(section: str, kwargs: Optional[dict], result: dict) -> None:
    """Persist a fresh (non-error, non-stale) section result."""
    if not _enabled() or not isinstance(result, dict):
        return
    if "error" in result or "stale" in result:
        return
    data = _load_all()
    data[_key(section, kwargs)] = {
        "result": result,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "code": code_hash(),
    }
    f = cache_file()
    try:
        f.parent.mkdir(parents=True, exist_ok=True)
        tmp = f.with_suffix(".tmp")
        tmp.write_text(json.dumps(data, indent=1, sort_keys=True))
        os.replace(tmp, f)
    except OSError:
        pass  # read-only cache dir — LKG is best-effort, never fatal


def stale_result(section: str, kwargs: Optional[dict],
                 error: str) -> Optional[dict]:
    """The most recent measured result for this section+config, marked
    stale, or None when nothing was ever measured (or LKG is disabled)."""
    if not _enabled():
        return None
    entry = _load_all().get(_key(section, kwargs))
    if not entry or not isinstance(entry.get("result"), dict):
        return None
    out = dict(entry["result"])
    out["stale"] = entry.get("ts", "unknown")
    out["stale_error"] = str(error)[:200]
    if entry.get("code") and entry["code"] != code_hash():
        out["stale_code"] = True
    return out
