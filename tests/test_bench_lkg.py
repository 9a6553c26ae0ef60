"""Last-known-good bench cache (utils/bench_lkg.py — VERDICT r4 weak #1).

Pure-host module: no jax, no devices. Pins the contract the driver's
BENCH artifact depends on: every section reports a number every round,
fresh or explicitly stale-marked.
"""

import json

import pytest

from unet_tpu.utils import bench_lkg


@pytest.fixture()
def lkg_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("UNET_TPU_BENCH_LKG_DIR", str(tmp_path))
    monkeypatch.delenv("UNET_TPU_BENCH_LKG", raising=False)
    return tmp_path


def test_store_then_stale_roundtrip(lkg_dir):
    res = {"tiles_per_sec_per_chip": 253.5, "batch_size": 24}
    bench_lkg.store("headline", {"tile": 512}, res)
    out = bench_lkg.stale_result("headline", {"tile": 512}, "timed out")
    assert out["tiles_per_sec_per_chip"] == 253.5
    assert out["batch_size"] == 24
    assert "stale" in out and out["stale_error"] == "timed out"
    # same code → no stale_code flag
    assert "stale_code" not in out


def test_key_includes_config(lkg_dir):
    bench_lkg.store("predict", {"batch_size": 64}, {"mpix": 220.0})
    assert bench_lkg.stale_result("predict", {"batch_size": 16}, "x") is None
    assert bench_lkg.stale_result("predict", {"batch_size": 64}, "x") is not None


def test_never_measured_returns_none(lkg_dir):
    assert bench_lkg.stale_result("nope", {}, "err") is None


def test_error_and_stale_results_not_stored(lkg_dir):
    bench_lkg.store("s", {}, {"error": "boom"})
    assert bench_lkg.stale_result("s", {}, "x") is None
    # a stale fallback must never be re-persisted as if freshly measured
    bench_lkg.store("s", {}, {"v": 1.0, "stale": "2026-01-01T00:00:00Z"})
    assert bench_lkg.stale_result("s", {}, "x") is None


def test_stale_code_flag_when_source_changed(lkg_dir):
    bench_lkg.store("s", {}, {"v": 2.0})
    # simulate a measurement taken under different sources
    f = bench_lkg.cache_file()
    data = json.loads(f.read_text())
    next(iter(data.values()))["code"] = "0" * 16
    f.write_text(json.dumps(data))
    out = bench_lkg.stale_result("s", {}, "x")
    assert out["stale_code"] is True


def test_disabled_via_env(lkg_dir, monkeypatch):
    monkeypatch.setenv("UNET_TPU_BENCH_LKG", "off")
    bench_lkg.store("s", {}, {"v": 3.0})
    assert bench_lkg.stale_result("s", {}, "x") is None
    assert not bench_lkg.cache_file().exists()


def test_corrupt_cache_file_is_tolerated(lkg_dir):
    bench_lkg.cache_file().parent.mkdir(parents=True, exist_ok=True)
    bench_lkg.cache_file().write_text("{not json")
    assert bench_lkg.stale_result("s", {}, "x") is None
    bench_lkg.store("s", {}, {"v": 4.0})  # overwrites the corrupt file
    assert bench_lkg.stale_result("s", {}, "x")["v"] == 4.0


def test_error_text_is_bounded(lkg_dir):
    bench_lkg.store("s", {}, {"v": 5.0})
    out = bench_lkg.stale_result("s", {}, "e" * 1000)
    assert len(out["stale_error"]) == 200
