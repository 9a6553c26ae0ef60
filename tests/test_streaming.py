"""Streamed raster I/O + whole-scene prediction (ROADMAP round-2 item:
multi-gigapixel AOIs in O(band) memory).

Covers the three new pieces end to end:
* ``geo.tiff.read_window`` — decode only intersecting strips/tiles, for
  every on-disk organization the codec writes (strips/tiles × compression)
* ``geo.tiff.StripStreamWriter`` — strip-at-a-time writes with the IFD
  placed after the pixel data; output must round-trip through ``read``
* ``predict.predict_raster_streamed`` — must produce the exact same mosaic
  as the in-RAM ``predict_raster`` path on the same scene/model
"""

import numpy as np
import pytest

from unet_tpu.geo import tiff


def _scene(h=100, w=130, c=3, dtype=np.uint8, seed=0):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        return rng.random((c, h, w)).astype(dtype)
    return rng.integers(0, np.iinfo(dtype).max, (c, h, w)).astype(dtype)


class TestReadWindow:
    @pytest.mark.parametrize("kw", [
        dict(),
        dict(compress="deflate"),
        dict(compress="lzw"),
        dict(compress="packbits"),
        dict(rows_per_strip=7),
        dict(tile=(16, 16)),
        dict(tile=(32, 16), compress="deflate"),
        dict(bigtiff=True, rows_per_strip=11),
        dict(byteorder=">"),
    ])
    def test_matches_full_read_slices(self, tmp_path, kw):
        arr = _scene()
        p = tmp_path / "s.tif"
        tiff.write(str(p), arr, transform=(0, 1, 0, 0, 0, -1), **kw)
        full, _ = tiff.read(str(p))
        cache = {}
        for (r0, r1, c0, c1) in [(0, 10, 0, None), (13, 57, 20, 77),
                                 (90, 100, 0, None), (0, 100, 0, 130),
                                 (42, 43, 129, 130)]:
            win, _ = tiff.read_window(str(p), r0, r1, c0, c1, _cache=cache)
            want = full[:, r0:r1, c0:(c1 if c1 is not None else 130)]
            np.testing.assert_array_equal(win, want)
        cache["f"].close()

    def test_float_predictor_window(self, tmp_path):
        arr = _scene(dtype=np.float32)
        p = tmp_path / "f.tif"
        tiff.write(str(p), arr, compress="deflate", predictor=True,
                   rows_per_strip=13)
        full, _ = tiff.read(str(p))
        win, _ = tiff.read_window(str(p), 20, 61, 5, 99)
        np.testing.assert_array_equal(win, full[:, 20:61, 5:99])

    def test_out_of_range_clamps(self, tmp_path):
        arr = _scene()
        p = tmp_path / "s.tif"
        tiff.write(str(p), arr)
        win, _ = tiff.read_window(str(p), 95, 200)
        assert win.shape == (3, 5, 130)


class TestStripStreamWriter:
    @pytest.mark.parametrize("compress", [None, "deflate", "packbits"])
    def test_roundtrip_matches_write(self, tmp_path, compress):
        arr = _scene(h=63, w=41, dtype=np.uint16)
        p = tmp_path / "out.tif"
        wr = tiff.StripStreamWriter(str(p), 63, 41, 3, np.uint16,
                                    transform=(5.0, 0.5, 0.0, 9.0, 0.0, -0.5),
                                    crs="EPSG:25832", nodata=0,
                                    compress=compress, rows_per_strip=10)
        hwc = np.moveaxis(arr, 0, 2)
        pos = 0
        for n in (1, 9, 10, 25, 18):  # uneven chunks straddling strips
            wr.append_rows(hwc[pos:pos + n])
            pos += n
        wr.close()
        back, info = tiff.read(str(p))
        np.testing.assert_array_equal(back, arr)
        assert info.transform == (5.0, 0.5, 0.0, 9.0, 0.0, -0.5)
        assert info.crs == "EPSG:25832"
        assert info.nodata == 0

    def test_chw_chunks_and_bigtiff(self, tmp_path):
        arr = _scene(h=30, w=20, c=1, dtype=np.float32)
        p = tmp_path / "big.tif"
        with tiff.StripStreamWriter(str(p), 30, 20, 1, np.float32,
                                    bigtiff=True, rows_per_strip=8) as wr:
            wr.append_rows(arr[:, :16])
            wr.append_rows(arr[:, 16:])
        back, _ = tiff.read(str(p))
        np.testing.assert_allclose(back, arr)

    def test_incomplete_close_raises(self, tmp_path):
        wr = tiff.StripStreamWriter(str(tmp_path / "x.tif"), 10, 5, 1, np.uint8)
        wr.append_rows(np.zeros((4, 5, 1), np.uint8))
        with pytest.raises(ValueError, match="4/10 rows"):
            wr.close()


@pytest.mark.slow
class TestStreamedPrediction:
    def test_streamed_equals_in_ram(self, tmp_path):
        """Train a tiny model, then assert the streamed whole-scene path is
        pixel-identical to the in-RAM predict_raster mosaic."""
        from unet_tpu.predict import predict_raster, predict_raster_streamed
        from unet_tpu.tiling import split_raster
        from unet_tpu.train import TrainerConfig, train_model

        rng = np.random.default_rng(3)
        h = w = 160
        img = rng.integers(10, 60, (3, h, w)).astype(np.uint8)
        msk = np.zeros((h, w), np.uint8)
        msk[40:90, 30:100] = 1
        img[0, 40:90, 30:100] = 200
        T = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
        ip = tmp_path / "scene.tif"
        tiff.write(str(ip), img, transform=T, crs="EPSG:32632")
        mp = tmp_path / "mask.tif"
        tiff.write(str(mp), msk[None], transform=T, crs="EPSG:32632")
        split_raster(str(ip), str(mp), str(tmp_path / "tiles"), patch_size=64,
                     patch_overlap=0.2, split=[0.8, 0.2], max_empty=1.0, seed=0)
        cfg = TrainerConfig(
            data_path=tmp_path / "tiles", model_path=tmp_path / "m",
            description="st", batch_size=2, epochs=1, lr=1e-3,
            arch="xresnet18", codes=["bg", "fg"], bf16=False, seed=0,
            visualize_data_example=False, export_model_summary=False,
        )
        bundle = train_model(cfg)

        ram, transform, crs = predict_raster(
            str(bundle), str(ip), patch_size=64, patch_overlap=0.2,
            batch_size=2, device_budget_bytes=0)  # force host accumulator
        out = tmp_path / "streamed.tif"
        predict_raster_streamed(str(bundle), str(ip), str(out),
                                patch_size=64, patch_overlap=0.2, batch_size=2)
        streamed, info = tiff.read(str(out))
        np.testing.assert_array_equal(streamed[0], np.asarray(ram)[..., 0]
                                      if np.asarray(ram).ndim == 3 else np.asarray(ram))
        assert info.transform == T
        assert info.crs == "EPSG:32632"

        # probability outputs stream identically (all_classes: C-band f32)
        ram_ac, _, _ = predict_raster(
            str(bundle), str(ip), patch_size=64, patch_overlap=0.2,
            batch_size=2, all_classes=True, device_budget_bytes=0)
        out_ac = tmp_path / "streamed_ac.tif"
        predict_raster_streamed(str(bundle), str(ip), str(out_ac),
                                patch_size=64, patch_overlap=0.2,
                                batch_size=2, all_classes=True)
        streamed_ac, info_ac = tiff.read(str(out_ac))
        assert streamed_ac.shape[0] == 2 and streamed_ac.dtype == np.float32
        np.testing.assert_allclose(streamed_ac, np.asarray(ram_ac), rtol=1e-6)

    def test_budget_routes_to_streaming(self, tmp_path, capsys):
        """predict_raster silently switches to the streamed path when the
        scene+mosaic would exceed host_budget_bytes."""
        from unet_tpu.predict import predict_raster
        from unet_tpu.tiling import split_raster
        from unet_tpu.train import TrainerConfig, train_model

        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, (3, 96, 96)).astype(np.uint8)
        msk = (img[0] > 127).astype(np.uint8)
        ip = tmp_path / "s.tif"
        tiff.write(str(ip), img, transform=(0, 1, 0, 0, 0, -1))
        mp = tmp_path / "m.tif"
        tiff.write(str(mp), msk[None], transform=(0, 1, 0, 0, 0, -1))
        split_raster(str(ip), str(mp), str(tmp_path / "t"), patch_size=48,
                     patch_overlap=0, split=[0.8, 0.2], max_empty=1.0, seed=0)
        cfg = TrainerConfig(
            data_path=tmp_path / "t", model_path=tmp_path / "mm",
            description="b", batch_size=2, epochs=1, lr=1e-3,
            arch="xresnet18", codes=["a", "b"], bf16=False, seed=0,
            visualize_data_example=False, export_model_summary=False,
        )
        bundle = train_model(cfg)
        out = tmp_path / "o.tif"
        arr, _, _ = predict_raster(str(bundle), str(ip), output_path=str(out),
                                   patch_size=48, patch_overlap=0,
                                   batch_size=2, host_budget_bytes=1)
        assert arr is None  # streamed: result lives in the file only
        back, _ = tiff.read(str(out))
        assert back.shape == (1, 96, 96)
        assert set(np.unique(back)) <= {0, 1}
