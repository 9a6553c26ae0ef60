"""JPEG decoder (geo/jpeg.py, baseline + progressive) + JPEG-in-TIFF
integration.

PIL (libjpeg) is the cross-validation oracle: our decoder must match its
output within IDCT rounding (±3 levels, mean < 1). The TIFF container
tests hand-assemble compression-7 files (PIL provides only the JPEG
streams) including the JPEGTables split — the shapes GDAL-written aerial
orthophotos use.
"""

import io
import struct

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from unet_tpu.geo import jpeg as jpeg_codec
from unet_tpu.geo import jpeg
from unet_tpu.geo import tiff


def _pil_jpeg_bytes(arr, **kw):
    im = PIL.fromarray(arr)
    buf = io.BytesIO()
    im.save(buf, format="JPEG", **kw)
    return buf.getvalue()


def _pil_decode(data):
    return np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))


def _gradient_scene(h=96, w=112, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        (yy * 255 / h), (xx * 255 / w), ((yy + xx) * 255 / (h + w))
    ], axis=-1)
    noise = rng.normal(0, 8, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


class TestBaselineDecoder:
    @pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
    def test_matches_pil_color(self, subsampling):
        arr = _gradient_scene()
        data = _pil_jpeg_bytes(arr, quality=92, subsampling=subsampling)
        want = _pil_decode(data).astype(np.int16)
        got = jpeg_codec.decode(data).astype(np.int16)
        assert got.shape == want.shape
        diff = np.abs(got - want)
        assert diff.max() <= 3, diff.max()
        assert diff.mean() < 1.0, diff.mean()

    def test_matches_pil_grayscale(self):
        arr = _gradient_scene()[:, :, 0]
        data = _pil_jpeg_bytes(arr, quality=90)
        want = np.asarray(PIL.open(io.BytesIO(data))).astype(np.int16)
        got = jpeg_codec.decode(data)[:, :, 0].astype(np.int16)
        assert np.abs(got - want).max() <= 3

    def test_restart_markers(self):
        arr = _gradient_scene(64, 80, seed=3)
        try:
            data = _pil_jpeg_bytes(arr, quality=90, restart_marker_blocks=4)
        except (TypeError, OSError):
            pytest.skip("PIL build lacks restart-marker control")
        assert b"\xff\xdd" in data  # DRI present
        want = _pil_decode(data).astype(np.int16)
        got = jpeg_codec.decode(data).astype(np.int16)
        assert np.abs(got - want).max() <= 3

    def test_unsupported_modes_raise_clearly(self):
        # Arithmetic sequential/progressive now decode (test_jpeg_arith);
        # the remaining gaps — hierarchical/differential frames and
        # arithmetic lossless (SOF11, no known encoder) — name themselves.
        for sof, pattern in ((0xC5, "differential"), (0xCB, "arithmetic lossless")):
            data = (b"\xff\xd8\xff" + bytes([sof]) + struct.pack(">H", 8)
                    + bytes(6) + b"\xff\xd9")
            with pytest.raises(ValueError, match=pattern):
                jpeg_codec.decode(data)


class TestProgressiveDecoder:
    """SOF2 multi-scan streams: spectral selection + successive
    approximation (DC first/refine, AC first/refine with EOB runs). The
    coefficients are identical to sequential once all scans land, so the
    PIL tolerance matches the baseline tests."""

    @pytest.mark.parametrize("subsampling", [0, 1, 2])
    def test_matches_pil_color(self, subsampling):
        arr = _gradient_scene()
        data = _pil_jpeg_bytes(arr, quality=92, subsampling=subsampling,
                               progressive=True)
        assert b"\xff\xc2" in data  # SOF2 actually present
        want = _pil_decode(data).astype(np.int16)
        got = jpeg_codec.decode(data).astype(np.int16)
        assert got.shape == want.shape
        diff = np.abs(got - want)
        assert diff.max() <= 3, diff.max()
        assert diff.mean() < 1.0, diff.mean()

    def test_matches_pil_grayscale(self):
        arr = _gradient_scene()[:, :, 0]
        data = _pil_jpeg_bytes(arr, quality=90, progressive=True)
        want = np.asarray(PIL.open(io.BytesIO(data))).astype(np.int16)
        got = jpeg_codec.decode(data)[:, :, 0].astype(np.int16)
        assert np.abs(got - want).max() <= 3

    def test_restart_markers(self):
        arr = _gradient_scene(64, 80, seed=3)
        try:
            data = _pil_jpeg_bytes(arr, quality=90, progressive=True,
                                   restart_marker_blocks=4)
        except (TypeError, OSError):
            pytest.skip("PIL build lacks restart-marker control")
        assert b"\xff\xdd" in data
        want = _pil_decode(data).astype(np.int16)
        got = jpeg_codec.decode(data).astype(np.int16)
        assert np.abs(got - want).max() <= 3

    def test_low_quality_many_scans(self):
        # low quality exercises long EOB runs across blocks
        arr = _gradient_scene(80, 96, seed=7)
        data = _pil_jpeg_bytes(arr, quality=25, progressive=True)
        want = _pil_decode(data).astype(np.int16)
        got = jpeg_codec.decode(data).astype(np.int16)
        assert np.abs(got - want).max() <= 3


def _split_tables(stream):
    """Split a JPEG stream into (abbreviated tables stream, scan stream) —
    the TIFF JPEGTables layout (tag 347)."""
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    n = len(stream)
    while pos + 4 <= n:
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        seg = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4, 0xDD):  # DQT/DHT/DRI → tables
            tables += seg
        else:
            rest += seg
        if marker == 0xDA:  # SOS: rest of stream is entropy data
            rest += stream[pos + 2 + seglen :]
            break
        pos += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def _make_jpeg_tiff(path, arr, strips_rows=None, use_tables=False,
                    progressive=False):
    """Hand-assemble a compression-7 TIFF: PIL encodes each strip's JPEG
    stream; optionally split shared tables into tag 347."""
    # progressive libjpeg always emits per-strip OPTIMIZED Huffman tables;
    # moving only strip 0's tables into tag 347 would corrupt strips 1+
    assert not (use_tables and progressive), "split-tables needs shared tables"
    h, w, c = arr.shape
    rows = strips_rows or h
    streams = []
    for y0 in range(0, h, rows):
        streams.append(_pil_jpeg_bytes(arr[y0 : y0 + rows], quality=95,
                                       subsampling=0, progressive=progressive))
    tables = None
    if use_tables:
        split = [_split_tables(s) for s in streams]
        tables = split[0][0]
        streams = [s[1] for s in split]

    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 3, None), (259, 3, 1, 7),
        (262, 3, 1, 6),  # YCbCr
        (273, 4, len(streams), None), (277, 3, 1, c), (278, 4, 1, rows),
        (279, 4, len(streams), None),
    ]
    if tables:
        entries.append((347, 7, len(tables), None))
    entries.sort()
    n_e = len(entries)
    ifd_off = 8
    overflow_pos = ifd_off + 2 + n_e * 12 + 4
    overflow = bytearray()
    resolved = []
    for tag, ft, cnt, val in entries:
        if tag == 258:
            resolved.append((tag, ft, 3, overflow_pos + len(overflow)))
            overflow += struct.pack("<HHH", 8, 8, 8)
        elif tag == 273:
            off_pos = overflow_pos + len(overflow)
            overflow += b"\x00" * (4 * len(streams))
            resolved.append((tag, ft, cnt, off_pos))
        elif tag == 279:
            cnt_pos = overflow_pos + len(overflow)
            overflow += struct.pack("<" + "I" * len(streams),
                                    *[len(s) for s in streams])
            resolved.append((tag, ft, cnt, cnt_pos))
        elif tag == 347:
            tb_pos = overflow_pos + len(overflow)
            overflow += tables
            if len(overflow) & 1:
                overflow += b"\x00"
            resolved.append((tag, ft, cnt, tb_pos))
        else:
            resolved.append((tag, ft, cnt, val))
    data_off = overflow_pos + len(overflow)
    offs, pos = [], data_off
    for s in streams:
        offs.append(pos)
        pos += len(s)
    overflow[off_pos - overflow_pos : off_pos - overflow_pos + 4 * len(streams)] = \
        struct.pack("<" + "I" * len(streams), *offs)
    # single-count entries keep value inline; multi/overflow use offsets
    body = struct.pack("<2sHI", b"II", 42, ifd_off) + struct.pack("<H", n_e)
    for tag, ft, cnt, val in resolved:
        body += struct.pack("<HHII", tag, ft, cnt, val)
    body += struct.pack("<I", 0)
    path.write_bytes(body + bytes(overflow) + b"".join(streams))


class TestJpegInTiff:
    def test_two_strips(self, tmp_path):
        # (the hand-assembler writes offset/count arrays out-of-line, which
        # classic TIFF only does for >1 value — keep >= 2 strips)
        arr = _gradient_scene(64, 80, seed=1)
        p = tmp_path / "j.tif"
        _make_jpeg_tiff(p, arr, strips_rows=32)
        got, info = tiff.read(str(p))
        assert info.bands == 3 and got.shape == (3, 64, 80)
        want = np.concatenate([
            _pil_decode(_pil_jpeg_bytes(arr[y : y + 32], quality=95, subsampling=0))
            for y in range(0, 64, 32)], axis=0)
        diff = np.abs(got.astype(np.int16) - np.moveaxis(want, 2, 0).astype(np.int16))
        assert diff.max() <= 3

    def test_multi_strip_with_jpegtables(self, tmp_path):
        arr = _gradient_scene(64, 80, seed=2)
        p = tmp_path / "jt.tif"
        _make_jpeg_tiff(p, arr, strips_rows=16, use_tables=True)
        got, info = tiff.read(str(p))
        assert got.shape == (3, 64, 80)
        # reconstruct expectation strip-by-strip through PIL
        want = np.concatenate([
            _pil_decode(_pil_jpeg_bytes(arr[y : y + 16], quality=95, subsampling=0))
            for y in range(0, 64, 16)], axis=0)
        diff = np.abs(got.astype(np.int16) - np.moveaxis(want, 2, 0).astype(np.int16))
        assert diff.max() <= 3

    def test_progressive_strips(self, tmp_path):
        """Progressive streams in a compression-7 TIFF decode through the
        pure-Python codec (the native decoder declines SOF2)."""
        arr = _gradient_scene(64, 80, seed=8)
        p = tmp_path / "jp.tif"
        _make_jpeg_tiff(p, arr, strips_rows=32, progressive=True)
        got, info = tiff.read(str(p))
        assert got.shape == (3, 64, 80)
        want = np.concatenate([
            _pil_decode(_pil_jpeg_bytes(arr[y : y + 32], quality=95,
                                        subsampling=0, progressive=True))
            for y in range(0, 64, 32)], axis=0)
        diff = np.abs(got.astype(np.int16) - np.moveaxis(want, 2, 0).astype(np.int16))
        assert diff.max() <= 3

    def test_windowed_read(self, tmp_path):
        arr = _gradient_scene(64, 80, seed=4)
        p = tmp_path / "jw.tif"
        _make_jpeg_tiff(p, arr, strips_rows=16)
        full, _ = tiff.read(str(p))
        win, _ = tiff.read_window(str(p), 20, 44, 5, 70)
        np.testing.assert_array_equal(win, full[:, 20:44, 5:70])


class TestNativeJpeg:
    """jpegdec.cpp is the production decoder for JPEG-in-TIFF (the Python
    Huffman loop is ~3000× slower); it must agree with geo/jpeg.py within
    ±2 levels (a chroma sample at an IDCT accumulation-order rounding
    boundary shifts the transformed color by up to round(1.772); at most a
    few pixels per image) and fall back cleanly on non-baseline streams."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from unet_tpu import native
        if native.get_lib() is None or not hasattr(native.get_lib(),
                                                   "unet_jpeg_decode"):
            pytest.skip("native library unavailable")
        self.native = native

    @pytest.mark.parametrize("subsampling", [0, 1, 2])
    def test_matches_python_decoder(self, subsampling):
        arr = _gradient_scene()
        data = _pil_jpeg_bytes(arr, quality=92, subsampling=subsampling)
        want = jpeg_codec.decode(data).astype(np.int16)
        got = self.native.jpeg_decode(data)
        assert got is not None
        diff = np.abs(got.astype(np.int16) - want)
        assert diff.max() <= 2
        assert (diff > 1).mean() < 1e-4  # rounding-boundary pixels only

    def test_grayscale_and_restart(self):
        g = _gradient_scene()[:, :, 0]
        data = _pil_jpeg_bytes(g, quality=90)
        want = jpeg_codec.decode(data)
        got = self.native.jpeg_decode(data)
        assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 1
        arr = _gradient_scene(64, 80, seed=3)
        try:
            data = _pil_jpeg_bytes(arr, quality=90, restart_marker_blocks=4)
        except (TypeError, OSError):
            pytest.skip("PIL build lacks restart-marker control")
        got = self.native.jpeg_decode(data)
        want = jpeg_codec.decode(data)
        assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 1

    def test_jpegtables_stream(self):
        arr = _gradient_scene(32, 48, seed=5)
        tables, scan = _split_tables(_pil_jpeg_bytes(arr, quality=95,
                                                     subsampling=0))
        want = jpeg_codec.decode(scan, tables=tables)
        got = self.native.jpeg_decode(scan, tables=tables)
        assert got is not None
        assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 1

    @pytest.mark.parametrize("subsampling", [0, 2])
    def test_progressive_matches_python(self, subsampling):
        data = _pil_jpeg_bytes(_gradient_scene(), quality=92,
                               subsampling=subsampling, progressive=True)
        assert b"\xff\xc2" in data
        want = jpeg_codec.decode(data).astype(np.int16)
        got = self.native.jpeg_decode(data)
        assert got is not None
        diff = np.abs(got.astype(np.int16) - want)
        assert diff.max() <= 2
        assert (diff > 1).mean() < 1e-4

    def test_arithmetic_returns_none(self):
        data = b"\xff\xd8\xff\xc9" + struct.pack(">H", 8) + bytes(6) + b"\xff\xd9"
        assert self.native.jpeg_decode(data) is None

    def test_corrupt_returns_none(self):
        data = _pil_jpeg_bytes(_gradient_scene(), quality=90)
        assert self.native.jpeg_decode(data[:40]) is None
        assert self.native.jpeg_decode(b"\x00\x01\x02") is None

    def test_malformed_streams_never_crash(self):
        """Truncations, bit-flips, and a forged giant frame header must
        fail cleanly (None or a decoded array) — never kill the process:
        the decoder sits behind a C ABI where an escaping exception is
        fatal to the training job."""
        rng = np.random.default_rng(11)
        for progressive in (False, True):
            data = bytearray(_pil_jpeg_bytes(_gradient_scene(48, 64),
                                             quality=85,
                                             progressive=progressive))
            for cut in (2, 10, 100, len(data) // 2, len(data) - 1):
                self.native.jpeg_decode(bytes(data[:cut]))
            for _ in range(50):
                mut = bytearray(data)
                for _ in range(rng.integers(1, 6)):
                    mut[rng.integers(2, len(mut))] = rng.integers(0, 256)
                self.native.jpeg_decode(bytes(mut))
        # forged SOF dims (65535×65535): must refuse, not allocate 12 GB
        base = _pil_jpeg_bytes(_gradient_scene(48, 64), quality=85)
        sof = base.find(b"\xff\xc0")
        assert sof > 0
        forged = bytearray(base)
        forged[sof + 5 : sof + 9] = b"\xff\xff\xff\xff"
        assert self.native.jpeg_decode(bytes(forged)) is None
        # SOS naming Huffman slot 15: the 4-bit field must not index past
        # the 4-entry table arrays (found by ASan fuzzing)
        sos = base.find(b"\xff\xda")
        assert sos > 0
        forged = bytearray(base)
        forged[sos + 6] = 0xFF  # first component's dc/ac selectors
        assert self.native.jpeg_decode(bytes(forged)) is None
        # a second SOF mid-stream must not re-write the sampling geometry
        # the coefficient buffers were sized with (found by ASan fuzzing)
        sof_seg = bytes(base[sof : sof + 2 + ((base[sof + 2] << 8) | base[sof + 3])])
        twisted = bytearray(sof_seg)
        twisted[11] = 0x11  # Y component 1x1 instead of subsampled
        assert self.native.jpeg_decode(
            bytes(base[:sos]) + bytes(twisted) + bytes(base[sos:])) is None

    def test_batch_decoders_read_jpeg_tiff(self, tmp_path):
        """JPEG tiles ride the multithreaded native batch path (training's
        hot loop), byte-identical to the Python-codec read."""
        arr = _gradient_scene(64, 80, seed=6)
        p = tmp_path / "jb.tif"
        _make_jpeg_tiff(p, arr, strips_rows=16, use_tables=True)
        want_chw, _ = tiff.read(str(p))
        want = np.moveaxis(want_chw, 0, 2)
        raw = self.native.decode_batch_raw([str(p)], 64, 80, 3, np.uint8)
        np.testing.assert_array_equal(raw[0], want)
        f32 = self.native.decode_batch([str(p)], 64, 80, 3)
        np.testing.assert_array_equal(f32[0].astype(np.uint8), want)


def _make_lossless_tiff(path, arr, strips_rows=None, predictor=1):
    """Hand-assemble a compression-7 TIFF whose strips are lossless (SOF3)
    JPEG streams — the layout legacy >8-bit aerial products used. PIL can
    neither write nor read these; geo.jpeg.encode_lossless produces them."""
    h, w, c = arr.shape
    bits = arr.dtype.itemsize * 8
    rows = strips_rows or h
    streams = [bytes(jpeg.encode_lossless(arr[y : y + rows], predictor=predictor))
               for y in range(0, h, rows)]
    photometric = 2 if c == 3 else 1
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, c, None), (259, 3, 1, 7),
        (262, 3, 1, photometric),
        (273, 4, len(streams), None), (277, 3, 1, c), (278, 4, 1, rows),
        (279, 4, len(streams), None),
    ]
    entries.sort()
    ifd_off = 8
    overflow_pos = ifd_off + 2 + len(entries) * 12 + 4
    overflow = bytearray()
    resolved = []
    for tag, ft, cnt, val in entries:
        if tag == 258:
            if c <= 2:
                resolved.append((tag, ft, c, bits if c == 1 else
                                 (bits | (bits << 16))))
            else:
                resolved.append((tag, ft, c, overflow_pos + len(overflow)))
                overflow += struct.pack("<" + "H" * c, *([bits] * c))
        elif tag == 273:
            off_pos = overflow_pos + len(overflow)
            overflow += b"\x00" * (4 * len(streams))
            resolved.append((tag, ft, cnt, off_pos))
        elif tag == 279:
            cnt_pos = overflow_pos + len(overflow)
            overflow += struct.pack("<" + "I" * len(streams),
                                    *[len(s) for s in streams])
            resolved.append((tag, ft, cnt, cnt_pos))
        else:
            resolved.append((tag, ft, cnt, val))
    data_off = overflow_pos + len(overflow)
    offs, pos = [], data_off
    for s in streams:
        offs.append(pos)
        pos += len(s)
    overflow[off_pos - overflow_pos : off_pos - overflow_pos + 4 * len(streams)] = \
        struct.pack("<" + "I" * len(streams), *offs)
    body = struct.pack("<2sHI", b"II", 42, ifd_off) + struct.pack("<H", len(entries))
    for tag, ft, cnt, val in resolved:
        body += struct.pack("<HHII", tag, ft, cnt, val)
    body += struct.pack("<I", 0)
    path.write_bytes(body + bytes(overflow) + b"".join(streams))


class TestLossless:
    """Lossless JPEG (SOF3, T.81 Annex H): bit-exact round trips through
    encode_lossless → decode across predictors, precisions, the point
    transform, and restart markers. PIL decodes none of these, so the
    encoder is the verification instrument (exact reconstruction of
    arbitrary random data is unforgeable)."""

    @pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
    def test_all_predictors_rgb8(self, predictor):
        rng = np.random.default_rng(predictor)
        arr = rng.integers(0, 256, (37, 41, 3)).astype(np.uint8)
        got = jpeg.decode(jpeg.encode_lossless(arr, predictor=predictor))
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, arr)

    @pytest.mark.parametrize("precision", [2, 8, 12, 16])
    def test_precisions_gray(self, precision):
        rng = np.random.default_rng(precision)
        arr = rng.integers(0, 1 << precision, (29, 31)).astype(np.uint16)
        got = jpeg.decode(jpeg.encode_lossless(arr, precision=precision,
                                               predictor=4))
        want_dtype = np.uint8 if precision <= 8 else np.uint16
        assert got.dtype == want_dtype
        np.testing.assert_array_equal(got[..., 0], arr.astype(want_dtype))

    def test_smooth_16bit_compresses(self):
        """A smooth 16-bit surface (the aerial nDSM case) must round-trip
        exactly AND actually compress (small residuals → short codes)."""
        y, x = np.mgrid[0:64, 0:72]
        arr = (20000 + 90 * np.sin(x / 7.0) * 50 + y * 13).astype(np.uint16)
        stream = jpeg.encode_lossless(arr, predictor=7)
        assert len(stream) < arr.nbytes
        np.testing.assert_array_equal(jpeg.decode(stream)[..., 0], arr)

    def test_point_transform(self):
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 4096, (17, 23)).astype(np.uint16)
        got = jpeg.decode(jpeg.encode_lossless(arr, precision=12,
                                               predictor=1, point_transform=2))
        np.testing.assert_array_equal(got[..., 0], (arr >> 2) << 2)

    @pytest.mark.parametrize("interval", [31, 23])  # row-aligned... and not
    def test_restart_markers(self, interval):
        rng = np.random.default_rng(interval)
        arr = rng.integers(0, 65536, (13, 31, 3)).astype(np.uint16)
        stream = jpeg.encode_lossless(arr, predictor=6,
                                      restart_interval=interval)
        assert b"\xff\xd0" in stream  # markers actually present
        np.testing.assert_array_equal(jpeg.decode(stream), arr)

    def test_single_row_and_column(self):
        rng = np.random.default_rng(9)
        row = rng.integers(0, 65536, (1, 19)).astype(np.uint16)
        col = rng.integers(0, 65536, (19, 1)).astype(np.uint16)
        np.testing.assert_array_equal(jpeg.decode(jpeg.encode_lossless(row, predictor=5))[..., 0], row)
        np.testing.assert_array_equal(jpeg.decode(jpeg.encode_lossless(col, predictor=5))[..., 0], col)

    def test_encoder_validation(self):
        arr = np.full((4, 4), 300, np.uint16)
        with pytest.raises(ValueError, match="exceed 8-bit"):
            jpeg.encode_lossless(arr, precision=8)
        with pytest.raises(ValueError, match="Predictor"):
            jpeg.encode_lossless(arr, predictor=0)
        with pytest.raises(ValueError, match="Point transform"):
            jpeg.encode_lossless(arr, point_transform=16)

    def test_lossless_tiff_16bit(self, tmp_path):
        """Compression-7 TIFF with 16-bit lossless strips reads exactly —
        the legacy aerial/satellite >8-bit product layout GDAL reads via
        libjpeg's lossless patch (reference utils.py:39-48 surface)."""
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 65536, (48, 40, 1)).astype(np.uint16)
        p = tmp_path / "ll16.tif"
        _make_lossless_tiff(p, arr, strips_rows=16, predictor=4)
        got, info = tiff.read(str(p))
        assert got.dtype == np.uint16 and info.bands == 1
        np.testing.assert_array_equal(got[0], arr[..., 0])

    def test_lossless_tiff_rgb8_multistrip(self, tmp_path):
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, (50, 36, 3)).astype(np.uint8)
        p = tmp_path / "ll8.tif"
        _make_lossless_tiff(p, arr, strips_rows=13, predictor=2)
        got, info = tiff.read(str(p))
        assert got.dtype == np.uint8 and got.shape == (3, 50, 36)
        np.testing.assert_array_equal(np.moveaxis(got, 0, 2), arr)

    def test_arithmetic_still_raises(self):
        stream = bytearray(jpeg.encode_lossless(
            np.zeros((8, 8), np.uint8)))
        sof = stream.find(b"\xff\xc3")
        stream[sof + 1] = 0xCB  # SOF11: arithmetic lossless
        with pytest.raises(ValueError, match="arithmetic"):
            jpeg.decode(bytes(stream))


class TestNativeLossless:
    """Native lossless decode (jpegdec.cpp decode16): bit parity with the
    Python Annex-H path and the uint16 batch pipeline."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from unet_tpu import native
        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        self.native = native

    @pytest.mark.parametrize("predictor", [1, 4, 7])
    def test_matches_python(self, predictor):
        rng = np.random.default_rng(predictor)
        arr = rng.integers(0, 65536, (26, 33, 3)).astype(np.uint16)
        stream = jpeg.encode_lossless(arr, predictor=predictor)
        got = self.native.jpeg_decode(stream)
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, jpeg.decode(stream))
        np.testing.assert_array_equal(got, arr)

    def test_restart_and_point_transform(self):
        rng = np.random.default_rng(11)
        arr = rng.integers(0, 4096, (19, 23)).astype(np.uint16)
        stream = jpeg.encode_lossless(arr, precision=12, predictor=5,
                                      point_transform=3, restart_interval=29)
        got = self.native.jpeg_decode(stream)
        np.testing.assert_array_equal(got[..., 0], (arr >> 3) << 3)

    def test_8bit_returns_uint8(self):
        rng = np.random.default_rng(12)
        arr = rng.integers(0, 256, (14, 15, 3)).astype(np.uint8)
        got = self.native.jpeg_decode(jpeg.encode_lossless(arr))
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, arr)

    def test_batch_decoder_reads_16bit_lossless_tiff(self, tmp_path):
        """int16-style 16-bit lossless tiles ride the multithreaded native
        batch path (the nDSM training-loader case)."""
        rng = np.random.default_rng(13)
        arr = rng.integers(0, 65536, (32, 40, 1)).astype(np.uint16)
        p = tmp_path / "nb16.tif"
        _make_lossless_tiff(p, arr, strips_rows=16, predictor=2)
        want_chw, _ = tiff.read(str(p))
        raw = self.native.decode_batch_raw([str(p)], 32, 40, 1, np.uint16)
        np.testing.assert_array_equal(raw[0][..., 0], want_chw[0])
        np.testing.assert_array_equal(raw[0][..., 0], arr[..., 0])

    def test_batch_decoder_reads_8bit_lossless_tiff(self, tmp_path):
        rng = np.random.default_rng(14)
        arr = rng.integers(0, 256, (24, 36, 3)).astype(np.uint8)
        p = tmp_path / "nb8.tif"
        _make_lossless_tiff(p, arr, strips_rows=8, predictor=1)
        raw = self.native.decode_batch_raw([str(p)], 24, 36, 3, np.uint8)
        np.testing.assert_array_equal(raw[0], arr)

    def test_corrupt_lossless_returns_none(self):
        stream = bytearray(jpeg.encode_lossless(np.zeros((8, 8), np.uint8)))
        sos = stream.find(b"\xff\xda")
        stream[sos + 2 + 3] = 99  # scan names an unknown component
        assert self.native.jpeg_decode(bytes(stream)) is None


class TestBaselineEncoder:
    """encode_baseline (SOF0, optimized Huffman tables): round trips
    through our decoder, PIL, and libjpeg's coefficient reader."""

    @pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
    @pytest.mark.parametrize("restart", [0, 5])
    def test_libjpeg_reads_back_exact_coefficients(self, jpegref, tmp_path,
                                                   sub, restart):
        from jpeg_util import coefs_equal, entropy_coefs, libjpeg_coefs, scene

        data = jpeg.encode_baseline(scene(nc=3), quality=88, subsampling=sub,
                                    restart_interval=restart)
        assert coefs_equal(entropy_coefs(data),
                           libjpeg_coefs(jpegref, data, tmp_path))

    @pytest.mark.parametrize("nc", [1, 3, 4])
    def test_round_trip_error_bounded(self, nc):
        from jpeg_util import scene

        arr = scene(nc=nc, seed=nc)
        out = jpeg.decode(jpeg.encode_baseline(arr, quality=95))
        if nc == 1:
            out = out[..., 0]
        assert np.abs(out.astype(np.int16) - arr.astype(np.int16)).mean() < 4

    @pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
    def test_pil_decodes_our_stream(self, sub):
        from jpeg_util import scene

        arr = scene(nc=3, seed=7)
        data = jpeg.encode_baseline(arr, quality=92, subsampling=sub)
        want = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB")
                          ).astype(np.int16)
        got = jpeg.decode(data).astype(np.int16)
        # two decoders' color+upsample rounding stack on the encode side
        # too, so the envelope is wider than the decode-only ±3
        diff = np.abs(got - want)
        assert diff.max() <= 8 and diff.mean() < 1.0

    def test_gray_matches_pil_tightly(self):
        from jpeg_util import scene

        arr = scene(nc=1, seed=5)
        data = jpeg.encode_baseline(arr, quality=90)
        want = np.asarray(PIL.open(io.BytesIO(data)).convert("L")
                          ).astype(np.int16)
        diff = np.abs(jpeg.decode(data)[..., 0].astype(np.int16) - want)
        assert diff.max() <= 2

    def test_restart_interval_output_identical(self):
        from jpeg_util import scene

        arr = scene(nc=1, seed=9)
        a = jpeg.decode(jpeg.encode_baseline(arr, quality=90))
        b = jpeg.decode(jpeg.encode_baseline(arr, quality=90,
                                             restart_interval=3))
        assert np.array_equal(a, b)

    def test_constant_image_single_symbol_tables(self):
        # one DC category + EOB only: the optimal-table builder must
        # produce a valid 1-entry code (reserved symbol eats all-ones)
        arr = np.full((24, 40), 130, np.uint8)
        out = jpeg.decode(jpeg.encode_baseline(arr, quality=90))
        assert np.abs(out.astype(np.int16) - 130).max() <= 2

    def test_deterministic(self):
        from jpeg_util import scene

        arr = scene(nc=3, seed=11)
        assert (jpeg.encode_baseline(arr, quality=77)
                == jpeg.encode_baseline(arr, quality=77))

    def test_input_validation(self):
        with pytest.raises(ValueError, match="8-bit"):
            jpeg.encode_baseline(np.zeros((8, 8), np.uint16))
        with pytest.raises(ValueError, match="subsampling"):
            jpeg.encode_baseline(np.zeros((8, 8), np.uint8),
                                 subsampling="4:1:1")
        with pytest.raises(ValueError, match="3-channel"):
            jpeg.encode_baseline(np.zeros((8, 8), np.uint8),
                                 subsampling="4:2:0")
