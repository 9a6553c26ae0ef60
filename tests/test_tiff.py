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


def test_window_shifts_transform():
    arr = np.zeros((2, 100, 100), dtype=np.uint8)
    r = Raster(arr, transform=TRANSFORM, crs="EPSG:25833")
    sub = r.window(10, 50, 20, 60)
    assert sub.data.shape == (2, 40, 40)
    assert sub.transform[0] == TRANSFORM[0] + 20 * 0.2
    assert sub.transform[3] == TRANSFORM[3] - 10 * 0.2
