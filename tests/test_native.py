import numpy as np
import pytest

from unet_tpu import native
from unet_tpu.geo import write_raster

T = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def _write_tiles(tmp_path, rng, n=6, h=40, w=48, c=4, dtype=np.uint8, **kw):
    paths = []
    for i in range(n):
        if np.issubdtype(dtype, np.floating):
            arr = rng.normal(size=(c, h, w)).astype(dtype)
        else:
            arr = rng.integers(0, min(np.iinfo(dtype).max, 30000), size=(c, h, w)).astype(dtype)
        p = tmp_path / f"tile_{i}.tif"
        write_raster(p, arr, transform=T, **kw)
        paths.append((p, arr))
    return paths


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.float32])
def test_native_matches_python_codec(tmp_path, rng, dtype):
    tiles = _write_tiles(tmp_path, rng, dtype=dtype)
    batch = native.decode_batch([p for p, _ in tiles], 40, 48, 4)
    for i, (_, arr) in enumerate(tiles):
        np.testing.assert_array_equal(batch[i], np.moveaxis(arr, 0, 2).astype(np.float32))


def test_native_deflate_predictor(tmp_path, rng):
    from unet_tpu.geo import tiff

    arr = rng.integers(0, 60000, size=(3, 64, 64)).astype(np.uint16)
    p = tmp_path / "c.tif"
    tiff.write(str(p), arr, transform=T, compress="deflate", predictor=True)
    batch = native.decode_batch([p], 64, 64, 3)
    np.testing.assert_array_equal(batch[0], np.moveaxis(arr, 0, 2).astype(np.float32))


def test_native_masks(tmp_path, rng):
    tiles = _write_tiles(tmp_path, rng, c=1)
    masks = native.decode_masks([p for p, _ in tiles], 40, 48)
    assert masks.dtype == np.int32
    for i, (_, arr) in enumerate(tiles):
        np.testing.assert_array_equal(masks[i], arr[0].astype(np.int32))


def test_native_error_on_missing_file(tmp_path, rng):
    tiles = _write_tiles(tmp_path, rng, n=2)
    with pytest.raises(RuntimeError, match="failed on tile"):
        native.decode_batch([tiles[0][0], tmp_path / "nope.tif"], 40, 48, 4)


def test_native_error_on_shape_mismatch(tmp_path, rng):
    tiles = _write_tiles(tmp_path, rng, n=1)
    with pytest.raises(RuntimeError):
        native.decode_batch([tiles[0][0]], 99, 99, 4)
