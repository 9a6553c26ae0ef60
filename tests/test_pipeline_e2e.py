"""Full-pipeline test: GeoTIFF scene → tiles → training → batched
prediction → georeferenced tile writes → overlap-merged mosaic → figures.

This is the reference's complete params_and_main.py workflow
(Create_tiles → Train → Predict) on a synthetic, trivially learnable scene,
asserting georeferencing survives the whole round trip.
"""

import numpy as np
import pytest

from unet_tpu.geo import read_raster, write_raster
from unet_tpu.predict import save_predictions
from unet_tpu.tiling import split_raster
from unet_tpu.train import TrainerConfig, train_model

T = (500000.0, 0.5, 0.0, 5400000.0, 0.0, -0.5)
SIZE = 128
TILE = 32


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    """A 128² RGB scene whose class is 1 where the red band is bright."""
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(11)
    img = rng.integers(1, 100, size=(3, SIZE, SIZE)).astype(np.uint8)
    bright = rng.random(size=(SIZE, SIZE)) < 0.5
    img[0][bright] = 200
    msk = (bright.astype(np.uint8) + 1)[None]  # classes 1/2, 0 stays nodata-free
    ip, mp = root / "scene.tif", root / "mask.tif"
    write_raster(ip, img, transform=T, crs="EPSG:25833", nodata=0)
    write_raster(mp, msk, transform=T, crs="EPSG:25833", nodata=0)
    return root, ip, mp


@pytest.fixture(scope="module")
def trained_bundle(scene):
    root, ip, mp = scene
    base = root / "tiles"
    n = split_raster(str(ip), str(mp), str(base), patch_size=TILE, patch_overlap=0,
                     split=[0.8, 0.2], max_empty=0.9, seed=3)
    assert n == 16
    cfg = TrainerConfig(
        data_path=base, model_path=root / "models", description="e2e",
        batch_size=4, epochs=6, lr=5e-3, arch="xresnet18",
        codes=["nodata", "dark", "bright"], bf16=False, seed=0,
        visualize_data_example=False, export_model_summary=True,
        tpu_opt=False,  # reference-parity topology e2e (tpu_opt — the
        # default — is covered by TestTpuOptQuality below)
    )
    bundle = train_model(cfg)
    return root, ip, bundle, base


@pytest.fixture(scope="module")
def pred_tiles(trained_bundle):
    """Prediction tiles: full scene, 0.2 overlap for edge blending."""
    root, ip, bundle, base = trained_bundle
    pred_dir = root / "pred" / "img_tiles"
    if not pred_dir.exists():
        split_raster(str(ip), None, str(root / "pred"), patch_size=TILE,
                     patch_overlap=0.2, split=[1.0], max_empty=1.0)
    return pred_dir


class TestEndToEnd:
    def test_artifacts_exist(self, trained_bundle):
        root, ip, bundle, base = trained_bundle
        assert (bundle / "e2e.json").exists()
        assert (bundle / "e2e_model_summary.txt").exists()
        assert (bundle / "e2e_history.png").exists()

    def test_tile_prediction_georeferenced_and_accurate(self, trained_bundle, pred_tiles):
        root, ip, bundle, base = trained_bundle
        pred_dir = pred_tiles
        out = save_predictions(str(bundle), str(pred_dir), regression=False,
                               merge=False, validation_vision=False, batch_size=4)
        outs = sorted(out.glob("*.tif"))
        assert len(outs) == len(list(pred_dir.glob("*.tif")))
        # georeferencing preserved per tile
        src = read_raster(next(iter(pred_dir.glob("*.tif"))))
        dst = read_raster(out / next(iter(pred_dir.glob("*.tif"))).name)
        assert np.allclose(src.transform, dst.transform)
        # accuracy vs ground truth on one tile
        truth = read_raster(root / "mask.tif").data[0]
        correct = total = 0
        for o in outs:
            r = read_raster(o)
            col0 = round((r.transform[0] - T[0]) / T[1])
            row0 = round((r.transform[3] - T[3]) / T[5])
            gt = truth[row0:row0 + TILE, col0:col0 + TILE]
            correct += np.sum(r.data[0] == gt)
            total += gt.size
        assert correct / total > 0.9, f"accuracy {correct/total}"

    def test_merged_mosaic(self, trained_bundle, pred_tiles):
        root, ip, bundle, base = trained_bundle
        pred_dir = pred_tiles
        mosaic_path = save_predictions(str(bundle), str(pred_dir), regression=False,
                                       merge=True, AOI="city", year="2026",
                                       validation_vision=False, batch_size=4)
        assert mosaic_path.name == "city_2026_e2e_prediction.tif"
        m = read_raster(mosaic_path)
        assert m.data.shape == (1, SIZE, SIZE)
        assert np.allclose(m.transform, T)
        truth = read_raster(root / "mask.tif").data[0]
        acc = np.mean(m.data[0] == truth)
        assert acc > 0.9, f"mosaic accuracy {acc}"

    def test_all_classes_mode(self, trained_bundle, pred_tiles):
        root, ip, bundle, base = trained_bundle
        pred_dir = pred_tiles
        out = save_predictions(str(bundle), str(pred_dir), merge=False,
                               all_classes=True, validation_vision=False, batch_size=4)
        r = read_raster(next(iter(sorted(out.glob("*.tif")))))
        assert r.data.shape[0] == 3  # full probability stack
        assert r.dtype == np.float32
        sums = r.data.sum(axis=0)
        np.testing.assert_allclose(sums, 1.0, atol=1e-3)  # softmax simplex

    def test_specific_class_and_large_file(self, trained_bundle, pred_tiles):
        root, ip, bundle, base = trained_bundle
        pred_dir = pred_tiles
        out = save_predictions(str(bundle), str(pred_dir), merge=False,
                               specific_class=2, large_file=True,
                               validation_vision=False, batch_size=4)
        r = read_raster(next(iter(sorted(out.glob("*.tif")))))
        # predict.py:245-249: probs × 31 rounded to int8
        assert r.data.shape[0] == 1
        assert r.data.dtype == np.int8
        assert 0 <= r.data.min() and r.data.max() <= 31

    def test_device_merge_matches_host_merge(self, trained_bundle, pred_tiles):
        """The Pallas/XLA device-side blend must agree with the reference's
        host accumulation path."""
        root, ip, bundle, base = trained_bundle
        pred_dir = pred_tiles
        host = save_predictions(str(bundle), str(pred_dir), merge=True,
                                AOI="h", validation_vision=False, batch_size=4)
        dev = save_predictions(str(bundle), str(pred_dir), merge=True,
                               AOI="d", validation_vision=False, batch_size=4,
                               device_merge=True)
        mh, md = read_raster(host), read_raster(dev)
        assert np.allclose(mh.transform, md.transform)
        agree = np.mean(mh.data == md.data)
        assert agree > 0.999, f"device vs host merge agreement {agree}"

    def test_validation_figures(self, trained_bundle):
        root, ip, bundle, base = trained_bundle
        vali_imgs = base / "vali" / "img_tiles"
        out = save_predictions(str(bundle), str(vali_imgs), regression=False,
                               merge=False, validation_vision=True, batch_size=4)
        assert (out / "Valid_figures" / "Confusion_Matrix.png").exists()
        assert (out / "Valid_figures" / "classification_report.png").exists()


class TestServeRaster:
    def test_predict_raster_direct(self, trained_bundle, tmp_path):
        """Whole-scene serving without pre-tiled files."""
        from unet_tpu.predict import predict_raster

        root, ip, bundle, base = trained_bundle
        out_path = tmp_path / "served.tif"
        arr, transform, crs = predict_raster(str(bundle), str(ip), str(out_path),
                                             patch_size=TILE, patch_overlap=0.2,
                                             batch_size=4)
        assert arr.shape == (SIZE, SIZE)
        assert np.allclose(transform, T)
        truth = read_raster(root / "mask.tif").data[0]
        acc = np.mean(arr == truth)
        assert acc > 0.9, f"served accuracy {acc}"
        r = read_raster(out_path)
        np.testing.assert_array_equal(r.data[0], arr)
        assert r.crs == "EPSG:25833"

    def test_mixed_size_tiles_grouped(self, trained_bundle, pred_tiles, tmp_path):
        """Batched prediction must handle folders with mixed tile sizes
        (the reference's batch-of-1 loop never hits this)."""
        import shutil

        root, ip, bundle, base = trained_bundle
        mixed = tmp_path / "mixed"
        mixed.mkdir()
        for i, t in enumerate(sorted(pred_tiles.glob("*.tif"))[:5]):
            shutil.copy(t, mixed / t.name)
        # one odd-size tile
        from unet_tpu.geo import read_raster as rr, write_raster as wr
        scene = rr(ip)
        wr(mixed / "odd_48.tif", scene.data[:, :48, :48],
           transform=scene.transform, crs=scene.crs)
        out = save_predictions(str(bundle), str(mixed), merge=False,
                               validation_vision=False, batch_size=4)
        outs = {p.name for p in out.glob("*.tif")}
        assert len(outs) == 6 and "odd_48.tif" in outs
        assert read_raster(out / "odd_48.tif").data.shape == (1, 48, 48)


class TestTpuOptQuality:
    """The tpu_opt model config (space-to-depth stem + half-res tail,
    models/unet.py) trades the reference's exact topology for TPU
    efficiency — this gate proves it still learns the e2e task to the same
    dice floor as the parity model."""

    def test_tpu_opt_trains_to_parity_floor(self, scene):
        root, ip, mp = scene
        base = root / "tiles_tpuopt"
        split_raster(str(ip), str(mp), str(base), patch_size=TILE, patch_overlap=0,
                     split=[0.8, 0.2], max_empty=0.9, seed=3)
        cfg = TrainerConfig(
            data_path=base, model_path=root / "models", description="e2e_tpuopt",
            # the fixture's classes are per-PIXEL noise — the least
            # favorable case for a half-res tail; the sub-pixel head solves
            # it but converges a few epochs later than the full-res tail
            batch_size=4, epochs=10, lr=5e-3, arch="xresnet18",
            codes=["nodata", "dark", "bright"], bf16=False, seed=0,
            tpu_opt=True,
        )
        train_model(cfg)
        import csv

        hist = root / "models" / "e2e_tpuopt" / "e2e_tpuopt_history.csv"
        rows = list(csv.DictReader(hist.open()))
        final_dice = float(rows[-1]["dice_multi"])
        assert final_dice > 0.85, f"tpu_opt quality regressed: dice {final_dice}"

    def test_tpu_opt_bundle_predicts(self, scene):
        root, ip, mp = scene
        bundle = root / "models" / "e2e_tpuopt"
        if not bundle.exists():
            pytest.skip("training test did not run")
        pred_dir = root / "pred_tpuopt"
        split_raster(str(ip), None, str(pred_dir), patch_size=TILE,
                     patch_overlap=0.2, max_empty=1.0)
        out = save_predictions(str(bundle), str(pred_dir / "img_tiles"),
                               merge=True, AOI="topt", year="2026", batch_size=4)
        pred = read_raster(out)
        assert pred.data.shape[1:] == (SIZE, SIZE)
        # manifest carries tpu_opt → prediction rebuilt the right topology
        import json
        manifest = json.loads((bundle / "e2e_tpuopt.json").read_text())
        assert manifest["tpu_opt"] is True
