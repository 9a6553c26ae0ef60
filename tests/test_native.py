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


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.float32])
def test_native_raw_decode_keeps_dtype(tmp_path, rng, dtype):
    """decode_batch_raw returns the tiles' own dtype (1 byte/px stays 1
    byte/px through host→device transfer)."""
    tiles = _write_tiles(tmp_path, rng, dtype=dtype)
    batch = native.decode_batch_raw([p for p, _ in tiles], 40, 48, 4, dtype)
    assert batch.dtype == dtype
    for i, (_, arr) in enumerate(tiles):
        np.testing.assert_array_equal(batch[i], np.moveaxis(arr, 0, 2))


@pytest.mark.parametrize("kw", [
    {"compress": "lzw"},
    {"compress": "lzw", "tile": (32, 32)},
    {"compress": "packbits"},
    {"compress": "deflate", "tile": (16, 16), "bigtiff": True},
    {"byteorder": ">"},
    {"byteorder": ">", "compress": "lzw", "predictor": True},
])
def test_native_decodes_realworld_containers(tmp_path, rng, kw):
    from unet_tpu.geo import tiff

    arr = rng.integers(0, 50000, size=(3, 70, 45)).astype(np.uint16)
    p = tmp_path / "c.tif"
    tiff.write(str(p), arr, transform=T, **kw)
    batch = native.decode_batch_raw([p], 70, 45, 3, np.uint16)
    np.testing.assert_array_equal(batch[0], np.moveaxis(arr, 0, 2))


def test_native_codec_primitives_roundtrip(rng):
    payloads = [
        b"",
        b"TOBEORNOTTOBEORTOBEORNOT" * 50,
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),
        bytes(rng.integers(0, 3, 120000, dtype=np.uint8)),  # forces table reset
    ]
    from unet_tpu.geo import tiff

    for data in payloads:
        enc = native.lzw_encode(data)
        assert native.lzw_decode(enc, len(data)) == data
        # cross-validate against the pure-Python codec both ways
        assert tiff.lzw_decode(enc) == data
        assert native.lzw_decode(tiff.lzw_encode(data), len(data)) == data
        pb = native.packbits_encode(data)
        assert native.packbits_decode(pb, len(data)) == data
        assert tiff.packbits_decode(pb, len(data)) == data


def test_loader_selection_env_override(tmp_path, rng, monkeypatch):
    """UNET_TPU_LOADER pins the decode path; default measures then picks."""
    from unet_tpu.data.dataset import TileDataset
    from unet_tpu.data.loader import TileLoader

    base = tmp_path / "ds"
    for split in ("trai",):
        (base / split / "img_tiles").mkdir(parents=True)
        (base / split / "mask_tiles").mkdir(parents=True)
        for i in range(4):
            img = rng.integers(0, 255, size=(3, 32, 32)).astype(np.uint8)
            msk = rng.integers(0, 2, size=(32, 32)).astype(np.uint8)
            write_raster(base / split / "img_tiles" / f"t_{i}.tif", img, transform=T)
            write_raster(base / split / "mask_tiles" / f"t_{i}.tif", msk, transform=T)
    ds = TileDataset(base)

    monkeypatch.setenv("UNET_TPU_LOADER", "python")
    ld = TileLoader(ds, ds.train_files, batch_size=2)
    assert ld._native is None and ld._native_decided
    imgs, masks, n = ld.one_batch()
    assert imgs.shape == (2, 32, 32, 3) and n == 2
    ld.close()

    monkeypatch.setenv("UNET_TPU_LOADER", "native")
    ld = TileLoader(ds, ds.train_files, batch_size=2)
    assert ld._native is not None and ld._native_decided
    imgs2, masks2, _ = ld.one_batch()
    assert imgs2.dtype == imgs.dtype  # raw dtype parity between paths
    # class masks keep their storage dtype on BOTH paths (uint8 labels
    # cross h2d at 1 byte/px; the jitted step widens on device)
    assert masks.dtype == np.uint8 and masks2.dtype == np.uint8
    np.testing.assert_array_equal(np.sort(imgs.ravel()), np.sort(imgs2.ravel()))
    np.testing.assert_array_equal(np.sort(masks.ravel()), np.sort(masks2.ravel()))
    ld.close()

    monkeypatch.delenv("UNET_TPU_LOADER")
    ld = TileLoader(ds, ds.train_files, batch_size=2)
    imgs3, _, _ = ld.one_batch()
    assert ld._native_decided  # measured selection happened on first batch
    assert imgs3.dtype == imgs.dtype
    ld.close()
