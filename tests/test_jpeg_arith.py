"""Arithmetic-coded JPEG (geo/jpeg_arith.py): QM-coder + conditioning.

libjpeg is the interop oracle, driven through the tools/jpegref.c
harness (built on demand; tests skip without gcc+libjpeg): coefficient
dumps via jpeg_read_coefficients pin the entropy layer BIT-EXACTLY in
both directions — libjpeg-encoded streams (sequential, progressive,
restarts, color) must decode to identical quantized coefficients, and
libjpeg must read back exactly the coefficients our encoder intended.
PIL cross-checks pixels like the Huffman tests (same ±3 IDCT-rounding
convention, tests/test_jpeg.py).
"""

import io
import struct

import numpy as np
import pytest

from jpeg_util import (coefs_equal as _coefs_equal,
                       entropy_coefs as _my_coefs,
                       libjpeg_coefs as _libjpeg_coefs,
                       libjpeg_encode as _libjpeg_encode, scene as _scene)
from unet_tpu.geo import jpeg, jpeg_arith, tiff

PIL = pytest.importorskip("PIL.Image")


class TestDecodeInterop:
    """libjpeg-encoded arithmetic streams → bit-exact coefficients."""

    @pytest.mark.parametrize("nc,progressive,restart", [
        (1, 0, 0), (3, 0, 0), (3, 0, 11), (1, 1, 0), (3, 1, 0), (3, 1, 7),
    ])
    def test_coefficients_exact(self, jpegref, tmp_path, nc, progressive,
                                restart):
        arr = _scene(nc=nc)
        data = _libjpeg_encode(jpegref, arr, tmp_path, quality=88,
                               progressive=progressive, restart=restart)
        marker = b"\xff\xca" if progressive else b"\xff\xc9"
        assert data.find(marker) > 0
        assert _coefs_equal(_my_coefs(data), _libjpeg_coefs(jpegref, data,
                                                            tmp_path))

    def test_pixels_match_pil(self, jpegref, tmp_path):
        arr = _scene(nc=3)
        data = _libjpeg_encode(jpegref, arr, tmp_path, quality=92)
        got = jpeg.decode(data).astype(np.int16)
        want = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB")
                          ).astype(np.int16)
        diff = np.abs(got - want)
        assert diff.max() <= 3 and diff.mean() < 1.0


class TestEncodeInterop:
    """Our encoder's streams → libjpeg reads the intended coefficients."""

    @pytest.mark.parametrize("nc,restart", [(1, 0), (3, 0), (3, 5)])
    def test_libjpeg_reads_back_exact(self, jpegref, tmp_path, nc, restart):
        arr = _scene(nc=nc)
        data = jpeg_arith.encode_arithmetic(arr, quality=85,
                                            restart_interval=restart)
        assert _coefs_equal(_my_coefs(data),
                            _libjpeg_coefs(jpegref, data, tmp_path))

    def test_nondefault_conditioning(self, jpegref, tmp_path):
        """DAC bounds L/U/Kx alter the context model on both sides."""
        arr = _scene(nc=1, seed=5)
        data = jpeg_arith.encode_arithmetic(arr, quality=80,
                                            dc_cond=(1, 3), ac_kx=17)
        state = jpeg._State()
        jpeg._parse_markers(data, 2, state)
        assert state.arith_dc_cond[0] == (1, 3)
        assert state.arith_ac_cond[0] == 17
        assert _coefs_equal(_my_coefs(data),
                            _libjpeg_coefs(jpegref, data, tmp_path))

    def test_pil_decodes_our_stream(self, tmp_path):
        arr = _scene(nc=3, seed=7)
        data = jpeg_arith.encode_arithmetic(arr, quality=92)
        want = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB")
                          ).astype(np.int16)
        got = jpeg.decode(data).astype(np.int16)
        diff = np.abs(got - want)
        assert diff.max() <= 3 and diff.mean() < 1.0


class TestRoundTrip:
    """Self-contained round trips (no harness needed)."""

    @pytest.mark.parametrize("nc", [1, 3, 4])
    def test_pixel_error_bounded(self, nc):
        arr = _scene(nc=nc, seed=nc)
        data = jpeg_arith.encode_arithmetic(arr, quality=95)
        out = jpeg.decode(data)
        if nc == 1:
            out = out[..., 0]
        err = np.abs(out.astype(np.int16) - arr.astype(np.int16))
        assert err.mean() < 4.0

    def test_restart_independence(self):
        """Restart intervals reset coder + stats; output is identical."""
        arr = _scene(nc=1, seed=9)
        a = jpeg.decode(jpeg_arith.encode_arithmetic(arr, quality=90))
        b = jpeg.decode(jpeg_arith.encode_arithmetic(arr, quality=90,
                                                     restart_interval=3))
        assert np.array_equal(a, b)

    def test_deterministic(self):
        arr = _scene(nc=3, seed=11)
        assert (jpeg_arith.encode_arithmetic(arr, quality=77)
                == jpeg_arith.encode_arithmetic(arr, quality=77))


class TestContainerAndErrors:
    def test_jpeg_in_tiff(self, tmp_path):
        """Compression-7 TIFF holding an arithmetic JPEG stream."""
        arr = _scene(h=40, w=48, nc=3, seed=13)
        stream = jpeg_arith.encode_arithmetic(arr, quality=97)
        decoded = jpeg.decode(stream)  # what the tile should yield
        path = tmp_path / "arith.tif"
        tags = [
            (256, 3, 1, 48), (257, 3, 1, 40), (258, 3, 3, (8, 8, 8)),
            (259, 3, 1, 7), (262, 3, 1, 6), (277, 3, 1, 3),
            (278, 3, 1, 40), (284, 3, 1, 1), (339, 3, 3, (1, 1, 1)),
        ]
        # hand-assemble: header, one strip, IFD (mirrors test_jpeg.py's
        # container tests)
        strip = stream
        header = struct.pack("<2sHI", b"II", 42, 8 + len(strip))
        body = bytearray(header) + bytearray(strip)
        entries = []
        extra = bytearray()
        ifd_pos = len(body)
        n_entries = len(tags) + 2
        extra_base = ifd_pos + 2 + 12 * n_entries + 4

        def pack_tag(tag, typ, cnt, val):
            if typ == 3 and isinstance(val, tuple):
                if cnt <= 2:
                    raw = struct.pack(f"<{cnt}H", *val).ljust(4, b"\0")
                    return struct.pack("<HHI4s", tag, typ, cnt, raw)
                off = extra_base + len(extra)
                extra.extend(struct.pack(f"<{cnt}H", *val))
                return struct.pack("<HHII", tag, typ, cnt, off)
            return struct.pack("<HHII", tag, typ, cnt, val)

        for tag, typ, cnt, val in tags:
            entries.append(pack_tag(tag, typ, cnt, val))
        entries.append(struct.pack("<HHII", 273, 4, 1, 8))  # StripOffsets
        entries.append(struct.pack("<HHII", 279, 4, 1, len(strip)))
        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
        body += struct.pack("<H", n_entries) + b"".join(entries)
        body += struct.pack("<I", 0) + extra
        path.write_bytes(body)

        data, info = tiff.read(str(path))
        assert data.shape == (3, 40, 48)
        assert np.array_equal(data, decoded.transpose(2, 0, 1))

    def test_sof11_clear_error(self):
        stream = bytearray(jpeg_arith.encode_arithmetic(_scene(nc=1)))
        i = stream.find(b"\xff\xc9")
        stream[i + 1] = 0xCB
        with pytest.raises(ValueError, match="arithmetic lossless"):
            jpeg.decode(bytes(stream))

    def test_corrupt_restart_detected(self):
        data = bytearray(jpeg_arith.encode_arithmetic(
            _scene(nc=1, seed=3), quality=90, restart_interval=2))
        i = data.find(b"\xff\xd0")
        assert i > 0
        data[i + 1] = 0xD5  # out-of-order restart index
        with pytest.raises(ValueError, match="restart"):
            jpeg.decode(bytes(data))
