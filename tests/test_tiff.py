import numpy as np
import pytest

from unet_tpu.geo import Raster, read_raster, write_raster, tiff


TRANSFORM = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.int32, np.float32, np.float64])
@pytest.mark.parametrize("bands", [1, 3, 5])
def test_roundtrip_dtypes_bands(tmp_path, rng, dtype, bands):
    if np.issubdtype(dtype, np.floating):
        arr = rng.normal(size=(bands, 37, 53)).astype(dtype)
    else:
        hi = min(np.iinfo(dtype).max, 10_000)
        arr = rng.integers(0, hi, size=(bands, 37, 53)).astype(dtype)
    p = tmp_path / "t.tif"
    write_raster(p, arr, transform=TRANSFORM, crs="EPSG:25833", nodata=0)
    r = read_raster(p)
    np.testing.assert_array_equal(r.data, arr)
    assert r.data.dtype == dtype
    assert r.crs == "EPSG:25833"
    assert r.nodata == 0
    assert np.allclose(r.transform, TRANSFORM)


def test_roundtrip_deflate_and_predictor(tmp_path, rng):
    arr = rng.integers(0, 65535, size=(4, 128, 96)).astype(np.uint16)
    p = tmp_path / "c.tif"
    tiff.write(str(p), arr, transform=TRANSFORM, compress="deflate", predictor=True)
    back, info = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)
    # compressed file with predictor should round-trip metadata too
    assert info.bands == 4 and info.dtype == np.uint16


def test_multi_strip(tmp_path, rng):
    arr = rng.integers(0, 255, size=(3, 501, 40)).astype(np.uint8)
    p = tmp_path / "s.tif"
    tiff.write(str(p), arr, rows_per_strip=64)
    back, info = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)


def test_2d_write_gets_band_axis(tmp_path, rng):
    arr = rng.integers(0, 5, size=(30, 31)).astype(np.uint8)
    p = tmp_path / "m.tif"
    write_raster(p, arr)
    r = read_raster(p)
    assert r.data.shape == (1, 30, 31)
    np.testing.assert_array_equal(r.data[0], arr)


def test_nongeo_file_has_no_transform(tmp_path, rng):
    arr = rng.integers(0, 255, size=(1, 8, 8)).astype(np.uint8)
    p = tmp_path / "n.tif"
    write_raster(p, arr)
    r = read_raster(p)
    assert r.transform is None and r.crs is None and r.nodata is None


def test_custom_crs_citation_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 255, size=(1, 8, 8)).astype(np.uint8)
    p = tmp_path / "w.tif"
    write_raster(p, arr, crs="LOCAL_CS[custom]")
    r = read_raster(p)
    assert r.crs == "LOCAL_CS[custom]"


def test_float_nodata(tmp_path, rng):
    arr = rng.normal(size=(1, 8, 8)).astype(np.float32)
    p = tmp_path / "f.tif"
    write_raster(p, arr, nodata=-9999)
    r = read_raster(p)
    assert r.nodata == -9999.0


def test_pil_can_read_plain_uint8(tmp_path, rng):
    """Cross-validate the writer against an independent TIFF implementation."""
    from PIL import Image

    arr = rng.integers(0, 255, size=(1, 25, 33)).astype(np.uint8)
    p = tmp_path / "p.tif"
    write_raster(p, arr)
    with Image.open(p) as im:
        np.testing.assert_array_equal(np.asarray(im), arr[0])


def test_read_pil_written_file(tmp_path, rng):
    """Cross-validate the reader against PIL-written multiband files."""
    from PIL import Image

    hwc = rng.integers(0, 255, size=(21, 17, 3)).astype(np.uint8)
    p = tmp_path / "pil.tif"
    Image.fromarray(hwc, mode="RGB").save(p)
    back, info = tiff.read(str(p))
    np.testing.assert_array_equal(back, np.moveaxis(hwc, 2, 0))


# --- real-world format coverage: tiled / LZW / PackBits / BigTIFF / MM ------


@pytest.mark.parametrize("compress", [None, "deflate", "lzw", "packbits"])
def test_roundtrip_compressions(tmp_path, rng, compress):
    arr = rng.integers(0, 255, size=(3, 70, 45)).astype(np.uint8)
    p = tmp_path / "c.tif"
    tiff.write(str(p), arr, transform=TRANSFORM, compress=compress)
    back, info = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)
    assert np.allclose(info.transform, TRANSFORM)


@pytest.mark.parametrize("compress", [None, "deflate", "lzw", "packbits"])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_roundtrip_tiled(tmp_path, rng, compress, dtype):
    """Tiled organization (tags 322-325) — how real orthophotos are stored."""
    if np.issubdtype(dtype, np.floating):
        arr = rng.normal(size=(4, 100, 77)).astype(dtype)
    else:
        arr = rng.integers(0, 200, size=(4, 100, 77)).astype(dtype)
    p = tmp_path / "t.tif"
    tiff.write(str(p), arr, transform=TRANSFORM, crs="EPSG:25833",
               compress=compress, tile=(32, 48))
    back, info = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)
    assert info.crs == "EPSG:25833"


def test_tiled_with_predictor(tmp_path, rng):
    arr = rng.integers(0, 60000, size=(2, 64, 64)).astype(np.uint16)
    p = tmp_path / "tp.tif"
    tiff.write(str(p), arr, compress="lzw", tile=(32, 32), predictor=True)
    back, _ = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)


def test_tile_dims_must_be_multiple_of_16(tmp_path, rng):
    arr = rng.integers(0, 255, size=(1, 32, 32)).astype(np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        tiff.write(str(tmp_path / "x.tif"), arr, tile=(20, 32))


@pytest.mark.parametrize("compress", [None, "deflate", "lzw"])
def test_roundtrip_bigtiff(tmp_path, rng, compress):
    arr = rng.integers(0, 4000, size=(3, 90, 60)).astype(np.uint16)
    p = tmp_path / "big.tif"
    tiff.write(str(p), arr, transform=TRANSFORM, crs="EPSG:4326",
               nodata=0, compress=compress, bigtiff=True)
    with open(p, "rb") as f:
        assert f.read(4)[2:] == b"\x2b\x00"  # magic 43 little-endian
    back, info = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)
    assert info.crs == "EPSG:4326" and info.nodata == 0


def test_roundtrip_bigtiff_tiled(tmp_path, rng):
    arr = rng.integers(0, 255, size=(4, 70, 70)).astype(np.uint8)
    p = tmp_path / "bt.tif"
    tiff.write(str(p), arr, compress="deflate", tile=(32, 32), bigtiff=True)
    back, _ = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.float32])
def test_roundtrip_bigendian(tmp_path, rng, dtype):
    """MM byte order: both container metadata and pixel data."""
    if np.issubdtype(dtype, np.floating):
        arr = rng.normal(size=(3, 33, 29)).astype(dtype)
    else:
        arr = rng.integers(0, 127, size=(3, 33, 29)).astype(dtype)
    p = tmp_path / "mm.tif"
    tiff.write(str(p), arr, transform=TRANSFORM, crs="EPSG:25833",
               byteorder=">")
    with open(p, "rb") as f:
        assert f.read(2) == b"MM"
    back, info = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == dtype  # returned in native order
    assert info.crs == "EPSG:25833"


def test_roundtrip_bigendian_bigtiff_tiled_lzw(tmp_path, rng):
    """The worst case all at once."""
    arr = rng.integers(0, 60000, size=(5, 83, 51)).astype(np.uint16)
    p = tmp_path / "worst.tif"
    tiff.write(str(p), arr, transform=TRANSFORM, byteorder=">",
               bigtiff=True, tile=(16, 32), compress="lzw", predictor=True)
    back, info = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)
    assert np.allclose(info.transform, TRANSFORM)


def test_float_predictor_roundtrip(tmp_path, rng):
    """TIFF predictor 3 (floating point byte-plane differencing)."""
    arr = rng.normal(size=(2, 40, 30)).astype(np.float32)
    p = tmp_path / "fp.tif"
    tiff.write(str(p), arr, compress="deflate", predictor=True)
    info = tiff.read_info(str(p))
    assert info.tags.get(tiff.TAG_PREDICTOR) == 3
    back, _ = tiff.read(str(p))
    np.testing.assert_array_equal(back, arr)


def test_lzw_codec_pure():
    """LZW encode/decode round-trip on assorted payloads."""
    rng = np.random.default_rng(7)
    for payload in (
        b"",
        b"A",
        b"TOBEORNOTTOBEORTOBEORNOT" * 10,
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),   # incompressible
        bytes(rng.integers(0, 4, 70000, dtype=np.uint8)),    # forces table reset
        b"\x00" * 10000,
    ):
        assert tiff.lzw_decode(tiff.lzw_encode(payload)) == payload


def test_packbits_codec_pure():
    rng = np.random.default_rng(8)
    for payload in (
        b"",
        b"\xaa" * 300,
        bytes(rng.integers(0, 256, 1000, dtype=np.uint8)),
        b"ab" + b"\x00" * 130 + b"xyz",
    ):
        assert tiff.packbits_decode(tiff.packbits_encode(payload)) == payload


def test_read_pil_written_lzw(tmp_path, rng):
    """Cross-validate our LZW decoder against libtiff-written streams."""
    from PIL import Image

    hwc = rng.integers(0, 255, size=(64, 80, 3)).astype(np.uint8)
    p = tmp_path / "pil_lzw.tif"
    Image.fromarray(hwc, mode="RGB").save(p, compression="tiff_lzw")
    info = tiff.read_info(str(p))
    assert info.tags.get(tiff.TAG_COMPRESSION) == tiff.COMP_LZW
    back, _ = tiff.read(str(p))
    np.testing.assert_array_equal(back, np.moveaxis(hwc, 2, 0))


def test_read_pil_written_packbits(tmp_path, rng):
    from PIL import Image

    hw = (rng.integers(0, 5, size=(33, 47)) * 40).astype(np.uint8)
    p = tmp_path / "pil_pb.tif"
    Image.fromarray(hw).save(p, compression="packbits")
    back, _ = tiff.read(str(p))
    np.testing.assert_array_equal(back[0], hw)


def test_pil_reads_our_lzw(tmp_path, rng):
    """And the reverse: libtiff decodes streams our encoder produced."""
    from PIL import Image

    arr = rng.integers(0, 255, size=(1, 120, 90)).astype(np.uint8)
    p = tmp_path / "ours_lzw.tif"
    tiff.write(str(p), arr, compress="lzw")
    with Image.open(p) as im:
        np.testing.assert_array_equal(np.asarray(im), arr[0])


def test_pil_reads_our_tiled(tmp_path, rng):
    from PIL import Image

    arr = rng.integers(0, 255, size=(1, 70, 90)).astype(np.uint8)
    p = tmp_path / "ours_tiled.tif"
    tiff.write(str(p), arr, tile=(32, 32))
    with Image.open(p) as im:
        np.testing.assert_array_equal(np.asarray(im), arr[0])


def test_unsupported_compression_names_feature(tmp_path, rng, monkeypatch):
    """Errors must name the missing feature (VERDICT round 1)."""
    arr = rng.integers(0, 255, size=(1, 16, 16)).astype(np.uint8)
    p = tmp_path / "j.tif"
    tiff.write(str(p), arr)
    # forge the compression tag to JPEG (7) and confirm the reader names it
    # when PIL cannot help
    data = bytearray(p.read_bytes())
    idx = data.find((259).to_bytes(2, "little"))
    assert idx > 0
    comp_off = idx + 8
    data[comp_off : comp_off + 2] = (7).to_bytes(2, "little")
    p.write_bytes(bytes(data))
    info = tiff.read_info(str(p))
    assert info.tags.get(tiff.TAG_COMPRESSION) == 7
    import unet_tpu.geo.tiff as tmod

    monkeypatch.setattr(tmod, "_pil_fallback_read",
                        lambda path, info, reason: (_ for _ in ()).throw(ValueError(reason)))
    with pytest.raises(ValueError, match="JPEG"):
        tiff.read(str(p))


def test_window_shifts_transform():
    arr = np.zeros((2, 100, 100), dtype=np.uint8)
    r = Raster(arr, transform=TRANSFORM, crs="EPSG:25833")
    sub = r.window(10, 50, 20, 60)
    assert sub.data.shape == (2, 40, 40)
    assert sub.transform[0] == TRANSFORM[0] + 20 * 0.2
    assert sub.transform[3] == TRANSFORM[3] - 10 * 0.2


class TestJpegWrite:
    """compress='jpeg' / 'jpeg-lossless' writes — GDAL's COMPRESS=JPEG
    orthophoto layout (new-style JPEG, compression 7), produced rather
    than only read."""

    def test_lossy_rgb_strips_round_trip_and_pil(self, tmp_path, rng):
        from PIL import Image

        yy, xx = np.mgrid[0:200, 0:150]
        arr = np.clip(np.stack([yy % 251, xx % 241, (yy + xx) % 233])
                      + rng.normal(0, 10, (3, 200, 150)), 0,
                      255).astype(np.uint8)
        p = tmp_path / "j.tif"
        tiff.write(str(p), arr, transform=TRANSFORM, crs="EPSG:25832",
                   compress="jpeg", quality=92, rows_per_strip=64)
        back, info = tiff.read(str(p))
        assert back.shape == arr.shape and info.transform == TRANSFORM
        assert np.abs(back.astype(np.int16) - arr.astype(np.int16)).mean() < 6
        # PIL (libjpeg) reads the same file: YCbCr photometric honored
        pil = np.asarray(Image.open(str(p)).convert("RGB")).transpose(2, 0, 1)
        assert np.abs(pil.astype(np.int16) - back.astype(np.int16)).max() <= 8
        assert p.stat().st_size < arr.nbytes / 2

    def test_lossy_gray_tiles(self, tmp_path, rng):
        from PIL import Image

        yy, xx = np.mgrid[0:130, 0:170]
        arr = np.clip((yy * 2 + xx) % 240 + rng.normal(0, 8, (130, 170)),
                      0, 255).astype(np.uint8)
        p = tmp_path / "jt.tif"
        tiff.write(str(p), arr, compress="jpeg", quality=95, tile=(64, 64))
        back, _ = tiff.read(str(p))
        assert np.abs(back[0].astype(np.int16) - arr.astype(np.int16)).mean() < 3
        pil = np.asarray(Image.open(str(p)).convert("L"))
        assert np.abs(pil.astype(np.int16) - back[0].astype(np.int16)).max() <= 2

    @pytest.mark.parametrize("dtype,bands", [(np.uint8, 3), (np.uint16, 4),
                                             (np.uint16, 1)])
    def test_lossless_bit_exact(self, tmp_path, rng, dtype, bands):
        hi = np.iinfo(dtype).max
        arr = rng.integers(0, hi, (bands, 90, 75)).astype(dtype)
        p = tmp_path / "jl.tif"
        tiff.write(str(p), arr, compress="jpeg-lossless", rows_per_strip=33)
        back, info = tiff.read(str(p))
        np.testing.assert_array_equal(back, arr)
        assert info.dtype == dtype

    def test_lossless_tiled_bit_exact(self, tmp_path, rng):
        arr = rng.integers(0, 65535, (2, 100, 100)).astype(np.uint16)
        p = tmp_path / "jlt.tif"
        tiff.write(str(p), arr, compress="jpeg-lossless", tile=(64, 64))
        back, _ = tiff.read(str(p))
        np.testing.assert_array_equal(back, arr)

    def test_stream_writer_jpeg_matches_whole_write(self, tmp_path, rng):
        yy, xx = np.mgrid[0:120, 0:80]
        arr = np.clip(np.stack([yy % 250, xx % 230, (yy * xx) % 210])
                      + rng.normal(0, 6, (3, 120, 80)), 0, 255).astype(np.uint8)
        pw = tmp_path / "whole.tif"
        tiff.write(str(pw), arr, compress="jpeg", quality=90,
                   rows_per_strip=40)
        ps = tmp_path / "stream.tif"
        w = tiff.StripStreamWriter(str(ps), 120, 80, 3, np.uint8,
                                   transform=TRANSFORM, compress="jpeg",
                                   rows_per_strip=40, quality=90)
        for r0 in range(0, 120, 30):
            w.append_rows(arr[:, r0:r0 + 30])
        w.close()
        a, _ = tiff.read(str(pw))
        b, info = tiff.read(str(ps))
        np.testing.assert_array_equal(a, b)
        assert info.transform == TRANSFORM

    def test_stream_writer_lossless_bit_exact(self, tmp_path, rng):
        arr = rng.integers(0, 60000, (2, 70, 55)).astype(np.uint16)
        ps = tmp_path / "sl.tif"
        w = tiff.StripStreamWriter(str(ps), 70, 55, 2, np.uint16,
                                   compress="jpeg-lossless",
                                   rows_per_strip=16)
        w.append_rows(arr)
        w.close()
        back, _ = tiff.read(str(ps))
        np.testing.assert_array_equal(back, arr)

    def test_input_validation(self, tmp_path):
        f32 = np.zeros((1, 16, 16), np.float32)
        u8_4 = np.zeros((4, 16, 16), np.uint8)
        with pytest.raises(ValueError, match="uint8"):
            tiff.write(str(tmp_path / "x.tif"), f32, compress="jpeg")
        with pytest.raises(ValueError, match="1 or 3 bands"):
            tiff.write(str(tmp_path / "x.tif"), u8_4, compress="jpeg")
        with pytest.raises(ValueError, match="predictor"):
            tiff.write(str(tmp_path / "x.tif"), u8_4[:3], compress="jpeg",
                       predictor=True)
        with pytest.raises(ValueError, match="uint8 or uint16"):
            tiff.write(str(tmp_path / "x.tif"), f32,
                       compress="jpeg-lossless")
        with pytest.raises(ValueError, match="uint8"):
            tiff.StripStreamWriter(str(tmp_path / "x.tif"), 8, 8, 1,
                                   np.float32, compress="jpeg")


class TestOverviews:
    """Reduced-resolution pages (write(overviews=[...]) — the gdaladdo /
    COG layout: NewSubfileType=1 IFDs chained behind the main image)."""

    def _arr(self, rng, c=3, h=210, w=150):
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack([(yy * (i + 2)) % (251 - i) for i in range(c)])
        return np.clip(base + rng.normal(0, 8, (c, h, w)), 0,
                       255).astype(np.uint8)

    def test_average_levels_exact(self, tmp_path, rng):
        arr = self._arr(rng)
        p = tmp_path / "ov.tif"
        tiff.write(str(p), arr, transform=TRANSFORM, crs="EPSG:25832",
                   compress="deflate", overviews=[2, 4, 8])
        full, info = tiff.read(str(p))
        np.testing.assert_array_equal(full, arr)  # main image untouched
        assert info.transform == TRANSFORM
        assert tiff.list_overviews(str(p)) == [(105, 75), (53, 38), (27, 19)]
        hwc = np.moveaxis(arr, 0, 2)
        for lvl, f in enumerate([2, 4, 8]):
            ov, oi = tiff.read_overview(str(p), lvl)
            eh, ew = -(-210 // f), -(-150 // f)
            pad = np.pad(hwc, ((0, eh * f - 210), (0, ew * f - 150), (0, 0)),
                         mode="edge")
            want = np.rint(pad.reshape(eh, f, ew, f, 3).astype(np.float64)
                           .mean((1, 3))).astype(np.uint8)
            np.testing.assert_array_equal(ov, np.moveaxis(want, 2, 0))
            assert int(oi.tags[254]) == 1  # NewSubfileType: reduced

    def test_nearest_for_class_maps(self, tmp_path, rng):
        classes = rng.integers(0, 5, (1, 64, 64)).astype(np.uint8)
        p = tmp_path / "cls.tif"
        tiff.write(str(p), classes, overviews=[4],
                   overview_resampling="nearest")
        ov, _ = tiff.read_overview(str(p), 0)
        np.testing.assert_array_equal(ov, classes[:, ::4, ::4])
        assert set(np.unique(ov)) <= set(np.unique(classes))

    def test_pil_reads_all_pages_exactly(self, tmp_path, rng):
        from PIL import Image

        arr = self._arr(rng)
        p = tmp_path / "pg.tif"
        tiff.write(str(p), arr, overviews=[2, 4])
        im = Image.open(str(p))
        sizes = []
        try:
            k = 0
            while True:
                im.seek(k)
                sizes.append(im.size)
                k += 1
        except EOFError:
            pass
        assert sizes == [(150, 210), (75, 105), (38, 53)]
        im.seek(1)
        ours, _ = tiff.read_overview(str(p), 0)
        np.testing.assert_array_equal(
            np.moveaxis(np.asarray(im.convert("RGB")), 2, 0), ours)

    def test_bigtiff_bigendian_tiled_jpeg_combo(self, tmp_path, rng):
        arr = self._arr(rng, h=130, w=170)
        p = tmp_path / "combo.tif"
        tiff.write(str(p), arr, compress="jpeg", quality=95, tile=(64, 64),
                   bigtiff=True, overviews=[2])
        full, _ = tiff.read(str(p))
        assert np.abs(full.astype(np.int16) - arr.astype(np.int16)).mean() < 4
        ov, oi = tiff.read_overview(str(p), 0)
        assert (oi.height, oi.width) == (65, 85)

    def test_single_page_and_errors(self, tmp_path, rng):
        p = tmp_path / "sp.tif"
        tiff.write(str(p), self._arr(rng, c=1, h=32, w=32))
        assert tiff.list_overviews(str(p)) == []
        with pytest.raises(ValueError, match="no page"):
            tiff.read_overview(str(p), 0)
        with pytest.raises(ValueError, match=">= 2"):
            tiff.write(str(tmp_path / "x.tif"),
                       self._arr(rng, c=1, h=16, w=16), overviews=[1])
        with pytest.raises(ValueError, match="resampling"):
            tiff.write(str(tmp_path / "x.tif"),
                       self._arr(rng, c=1, h=16, w=16), overviews=[2],
                       overview_resampling="cubic")

    def test_rgb_photometric_for_plain_byte_imagery(self, tmp_path, rng):
        # PIL/libtiff can't map photometric-1 + 3 samples to a pixel mode;
        # >=3-band uint8 now writes GDAL-style RGB (2)
        from PIL import Image

        arr = self._arr(rng)
        p = tmp_path / "rgb.tif"
        tiff.write(str(p), arr, compress="lzw")
        _, info = tiff.read(str(p))
        assert int(info.tags[262]) == 2
        np.testing.assert_array_equal(
            np.moveaxis(np.asarray(Image.open(str(p))), 2, 0), arr)
