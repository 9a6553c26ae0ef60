"""Corruption/truncation fuzz for the geo parsers (tiff.py, jpeg.py,
jpeg_arith.py).

The reference delegates raster parsing to libgdal/libjpeg, which are
fuzz-hardened upstream; our dependency-free codecs must meet the same
bar: ANY byte-corrupted or truncated input either decodes to an array
or raises ValueError promptly — never an unhandled IndexError /
struct.error / KeyError / MemoryError / OverflowError, and never a
hang. Deterministic seeds so failures reproduce; the per-case alarm
catches non-termination.
"""

import signal

import numpy as np
import pytest

from jpeg_util import scene
from unet_tpu.geo import jpeg, jpeg_arith, tiff

N_CASES = 150  # corruptions per fixture config
TIMEOUT_S = 10


class _Alarm(Exception):
    pass


def _run_guarded(fn, *args):
    """Run one decode attempt under the fuzz contract."""

    def handler(signum, frame):
        raise _Alarm

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(TIMEOUT_S)
    try:
        fn(*args)
        return None
    except ValueError:
        return None
    except _Alarm:
        return "hang (>%ds)" % TIMEOUT_S
    except Exception as e:  # noqa: BLE001 — the contract under test
        return f"{type(e).__name__}: {e}"
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _fuzz_bytes(data: bytes, seed: int):
    """Yield (case_id, corrupted) variants: byte flips, multi-byte
    scrambles, truncations, and small extensions."""
    rng = np.random.default_rng(seed)
    buf = bytearray(data)
    n = len(buf)
    for i in range(N_CASES):
        kind = i % 4
        out = bytearray(buf)
        if kind == 0:  # single byte flip
            p = int(rng.integers(0, n))
            out[p] = int(rng.integers(0, 256))
        elif kind == 1:  # burst scramble (up to 16 bytes)
            p = int(rng.integers(0, n))
            ln = int(rng.integers(1, 17))
            for j in range(p, min(n, p + ln)):
                out[j] = int(rng.integers(0, 256))
        elif kind == 2:  # truncation
            out = out[: int(rng.integers(0, n))]
        else:  # truncate + append garbage
            out = out[: int(rng.integers(1, n))]
            out += bytes(rng.integers(0, 256, int(rng.integers(1, 64)),
                                      dtype=np.uint8))
        yield i, bytes(out)


def _seed(fixture_name):
    import zlib

    return zlib.crc32(fixture_name.encode())


def _assert_contract(fixture_name, data, decode):
    failures = []
    for case, corrupt in _fuzz_bytes(data, seed=_seed(fixture_name)):
        outcome = _run_guarded(decode, corrupt)
        if outcome is not None:
            failures.append((case, outcome))
    assert not failures, (
        f"{fixture_name}: {len(failures)} contract violations, first: "
        f"case {failures[0][0]} → {failures[0][1]}")


def _tiff_bytes(**kw):
    import io
    import os
    import tempfile

    arr = kw.pop("array")
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    try:
        tiff.write(path, arr, **kw)
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def _decode_tiff(data: bytes):
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".tif")
    with os.fdopen(fd, "wb") as f:
        f.write(data)
    try:
        tiff.read(path)
    finally:
        os.unlink(path)


RGB = scene(h=40, w=52, nc=3, seed=3)
U16 = (scene(h=33, w=47, nc=1, seed=4).astype(np.uint16) * 257)


class TestTiffFuzz:
    @pytest.mark.parametrize("name,kw", [
        ("plain-strips", dict(array=np.moveaxis(RGB, 2, 0))),
        ("lzw-predictor", dict(array=np.moveaxis(RGB, 2, 0), compress="lzw",
                               predictor=True, rows_per_strip=8)),
        ("deflate-tiled", dict(array=U16[None].repeat(2, 0),
                               compress="deflate", tile=(16, 16))),
        ("packbits", dict(array=np.moveaxis(RGB, 2, 0), compress="packbits",
                          rows_per_strip=5)),
        ("jpeg-lossy", dict(array=np.moveaxis(RGB, 2, 0), compress="jpeg",
                            quality=85, rows_per_strip=16)),
        ("jpeg-lossless", dict(array=U16[None], compress="jpeg-lossless",
                               rows_per_strip=9)),
        ("bigtiff-be", dict(array=np.moveaxis(RGB, 2, 0), bigtiff=True,
                            byteorder=">")),
    ])
    def test_corrupt_tiff_never_crashes(self, name, kw):
        _assert_contract(f"tiff/{name}", _tiff_bytes(**kw), _decode_tiff)

    @pytest.mark.parametrize("name,kw", [
        ("win-strips-lzw", dict(array=np.moveaxis(RGB, 2, 0),
                                compress="lzw", rows_per_strip=8)),
        ("win-tiled", dict(array=U16[None].repeat(2, 0), compress="deflate",
                           tile=(16, 16))),
        ("win-jpeg", dict(array=np.moveaxis(RGB, 2, 0), compress="jpeg",
                          rows_per_strip=16)),
    ])
    def test_corrupt_window_read_never_crashes(self, name, kw):
        # the seek-based streamed path (read_window) is separate plumbing
        # from read(); it must meet the same contract
        import os
        import tempfile

        def decode_window(data):
            fd, path = tempfile.mkstemp(suffix=".tif")
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            try:
                tiff.read_window(path, 5, 20, 3, 30)
            finally:
                os.unlink(path)

        _assert_contract(f"win/{name}", _tiff_bytes(**kw), decode_window)


class TestJpegFuzz:
    @pytest.mark.parametrize("name,data", [
        ("baseline-444", jpeg.encode_baseline(RGB, quality=85)),
        ("baseline-420-rst", jpeg.encode_baseline(RGB, quality=85,
                                                  subsampling="4:2:0",
                                                  restart_interval=3)),
        ("lossless-16bit", jpeg.encode_lossless(U16, predictor=4)),
        ("lossless-rst", jpeg.encode_lossless(RGB, predictor=7,
                                              restart_interval=5)),
        ("arithmetic", jpeg_arith.encode_arithmetic(RGB, quality=85)),
        ("arithmetic-rst", jpeg_arith.encode_arithmetic(
            RGB, quality=85, restart_interval=4)),
    ])
    def test_corrupt_jpeg_never_crashes(self, name, data):
        _assert_contract(f"jpeg/{name}", data, jpeg.decode)


class TestNativeDecoderFuzz:
    """The C++ batch decoder is on the production loader hot path: a
    segfault there kills the training process (not catchable like the
    Python fallback's exceptions). Corrupt tiles must produce error
    returns — run in a subprocess so a crash fails the test instead of
    the suite. The ASan-hardening bar, re-pinned per round."""

    @pytest.mark.parametrize("name,kw,dims", [
        ("lzw", dict(array=np.moveaxis(RGB, 2, 0), compress="lzw",
                     predictor=True, rows_per_strip=8), (40, 52, 3, "uint8")),
        ("jpeg", dict(array=np.moveaxis(RGB, 2, 0), compress="jpeg",
                      rows_per_strip=16), (40, 52, 3, "uint8")),
        ("jpeg-lossless", dict(array=U16[None], compress="jpeg-lossless",
                               rows_per_strip=9), (33, 47, 1, "uint16")),
    ])
    def test_corrupt_tiles_never_crash_native(self, tmp_path, name, kw,
                                              dims):
        import os
        import subprocess
        import sys

        from unet_tpu import native

        if not native.available():
            pytest.skip("native decoder unavailable")
        h, w, c, dt = dims
        paths = []
        data = _tiff_bytes(**kw)
        rng_cases = _fuzz_bytes(data, seed=_seed(f"native/{name}"))
        for case, corrupt in rng_cases:
            if case >= 100:
                break
            p = tmp_path / f"{case}.tif"
            p.write_bytes(corrupt)
            paths.append(str(p))
        worker = os.path.join(os.path.dirname(__file__),
                              "native_fuzz_worker.py")
        r = subprocess.run(
            [sys.executable, worker, str(h), str(w), str(c), dt] + paths,
            capture_output=True, timeout=600,
            env=dict(os.environ, PYTHONPATH=os.path.dirname(
                os.path.dirname(os.path.abspath(worker)))))
        assert r.returncode == 0 and b"ALIVE" in r.stdout, (
            f"native decoder died (rc={r.returncode}): "
            f"{r.stderr.decode()[-300:]}")
