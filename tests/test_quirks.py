"""Bit-parity tests for the reference's quirks reproduced under
``reference_quirks`` (SURVEY.md §7 quirk list; VERDICT r1 item 7).

Each test pins a behavior of /root/reference that is arguably a bug but is
part of the behavioral contract when parity mode is requested.
"""

import numpy as np
import pytest

from unet_tpu.data.augment import n_augmented
from unet_tpu.data.dataset import TileDataset
from unet_tpu.data.weights import compute_class_weights
from unet_tpu.geo import write_raster
from unet_tpu.tiling import split_raster
from unet_tpu.tiling.windows import generate_windows

T = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)
T_ANISO = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.5)  # xres != |yres|


def _scene(tmp_path, rng, transform=T, dtype=np.uint8):
    if np.issubdtype(dtype, np.floating):
        img = (rng.normal(size=(3, 96, 96)) * 10).astype(dtype)
    else:
        img = rng.integers(1, 255, size=(3, 96, 96)).astype(dtype)
    msk = rng.integers(1, 3, size=(96, 96)).astype(np.uint8)
    ip, mp = tmp_path / "img.tif", tmp_path / "msk.tif"
    write_raster(ip, img, transform=transform, crs="EPSG:25833")
    write_raster(mp, msk, transform=transform, crs="EPSG:25833")
    return ip, mp, img, msk


class TestFloat32LoadTruncation:
    """data.py:24 ``astype(np.int32)`` truncates float rasters toward zero."""

    def test_quirk_truncates(self, tmp_path, rng):
        base = tmp_path / "ds"
        (base / "trai" / "img_tiles").mkdir(parents=True)
        (base / "trai" / "mask_tiles").mkdir(parents=True)
        img = np.array([[[1.9, -2.7], [0.4, 3.999]]], np.float32)
        msk = np.zeros((2, 2), np.uint8)
        write_raster(base / "trai" / "img_tiles" / "t_0.tif", img, transform=T)
        write_raster(base / "trai" / "mask_tiles" / "t_0.tif", msk, transform=T)

        clean = TileDataset(base).load_image(base / "trai" / "img_tiles" / "t_0.tif")
        np.testing.assert_array_equal(clean[0], img[0])  # default: no truncation

        quirky = TileDataset(base, reference_quirks=True).load_image(
            base / "trai" / "img_tiles" / "t_0.tif")
        np.testing.assert_array_equal(
            quirky[0], np.array([[1, -2], [0, 3]], np.int32))

    def test_quirk_leaves_ints_alone(self, tmp_path, rng):
        base = tmp_path / "ds"
        (base / "trai" / "img_tiles").mkdir(parents=True)
        (base / "trai" / "mask_tiles").mkdir(parents=True)
        img = rng.integers(0, 255, size=(2, 4, 4)).astype(np.uint8)
        write_raster(base / "trai" / "img_tiles" / "t_0.tif", img)
        write_raster(base / "trai" / "mask_tiles" / "t_0.tif", img[:1])
        quirky = TileDataset(base, reference_quirks=True).load_image(
            base / "trai" / "img_tiles" / "t_0.tif")
        np.testing.assert_array_equal(quirky, img)
        assert quirky.dtype == np.uint8


class TestCropGeotransformQuirk:
    """create_tiles_unet.py:224-226: tile y-origin computed with the X
    resolution (uly - y*xres instead of uly + y*yres)."""

    def test_identical_for_square_pixels(self, tmp_path, rng):
        from unet_tpu.geo import read_raster

        ip, mp, _, _ = _scene(tmp_path, rng, transform=T)
        for quirks, sub in ((False, "clean"), (True, "quirk")):
            split_raster(str(ip), str(mp), str(tmp_path / sub), patch_size=48,
                         split=[0.8, 0.2], seed=0, reference_quirks=quirks)
        for f in sorted((tmp_path / "clean").rglob("img_tiles/*.tif")):
            g = tmp_path / "quirk" / f.relative_to(tmp_path / "clean")
            np.testing.assert_allclose(
                read_raster(f).transform, read_raster(g).transform)

    def test_diverges_for_anisotropic_pixels(self, tmp_path, rng):
        from unet_tpu.geo import read_raster

        ip, mp, _, _ = _scene(tmp_path, rng, transform=T_ANISO)
        split_raster(str(ip), str(mp), str(tmp_path / "clean"), patch_size=48,
                     split=[0.8, 0.2], seed=0)
        split_raster(str(ip), str(mp), str(tmp_path / "quirk"), patch_size=48,
                     split=[0.8, 0.2], seed=0, reference_quirks=True)
        diverged = False
        for f in sorted((tmp_path / "clean").rglob("img_tiles/*.tif")):
            g = tmp_path / "quirk" / f.relative_to(tmp_path / "clean")
            ct, qt = read_raster(f).transform, read_raster(g).transform
            y = round((ct[3] - 5400000.0) / -0.5)  # window row offset
            if y:
                # quirk: uly - y*xres; clean: uly + y*yres
                assert qt[3] == pytest.approx(5400000.0 - y * 0.2)
                assert ct[3] == pytest.approx(5400000.0 - y * 0.5)
                diverged = True
        assert diverged  # at least one off-origin row tile existed


class TestSquareTileAssumption:
    """create_tiles_unet.py:210-219 passes crop.shape[0] as the GDAL x-size,
    correct only for square tiles. The bug is unreachable because sliding
    windows are always square — pin that precondition."""

    @pytest.mark.parametrize("h,w,ps,ov", [(96, 131, 48, 0.0), (100, 100, 33, 0.2),
                                           (64, 200, 64, 0.5)])
    def test_windows_always_square(self, h, w, ps, ov):
        for win in generate_windows(h, w, ps, ov):
            assert win.w == win.h == ps


class TestOneBatchClassWeights:
    """utils.py:109-116: weights from ONE shuffled batch; classes absent
    from the sample drop out producing a short, code-misaligned vector."""

    def _ds(self, tmp_path, rng, n_tiles=5, classes=(0, 1, 2)):
        base = tmp_path / "ds"
        (base / "trai" / "mask_tiles").mkdir(parents=True)
        for i in range(n_tiles):
            m = rng.choice(classes, size=(1, 8, 8)).astype(np.uint8)
            write_raster(base / "trai" / "mask_tiles" / f"t_{i}.tif", m)
        return base

    def test_quirk_drops_absent_class(self, tmp_path, rng):
        base = self._ds(tmp_path, rng, classes=(0, 2))  # class 1 never occurs
        clean = compute_class_weights(base, 3)
        assert len(clean) == 3 and clean[1] == 0.0
        quirky = compute_class_weights(base, 3, reference_quirks=True)
        assert len(quirky) == 2  # short vector, as the reference produces

    def test_quirk_matches_inverse_frequency(self, tmp_path, rng):
        base = self._ds(tmp_path, rng)
        quirky = compute_class_weights(base, 3, reference_quirks=True)
        clean = compute_class_weights(base, 3)
        # all classes present and < 1200 tiles → same numbers, same order
        np.testing.assert_allclose(quirky, clean, rtol=1e-12)

    def test_quirk_matches_fastai_sampler_simulation(self, tmp_path):
        """VERDICT r3 #9: quirks mode must replicate the reference sampler,
        not merely its failure shape. fastai's TfmdDL.shuffle_fn is legacy
        np.random.permutation (MT19937); the sampled batch is the first bs
        indices of that permutation over the (sorted) training tiles, and
        weights are total/counts over np.unique of that one batch
        (utils.py:109-116). Fixture: the rare class lives only in tiles the
        sampled batch misses, so the vector comes out short."""
        from unet_tpu.geo import read_raster

        base = tmp_path / "ds"
        mask_dir = base / "trai" / "mask_tiles"
        mask_dir.mkdir(parents=True)
        n, bs, seed = 8, 4, 7
        sampled = set(np.random.RandomState(seed).permutation(n)[:bs])
        rng = np.random.default_rng(3)
        for i in range(n):
            m = rng.choice([0, 2], size=(1, 8, 8)).astype(np.uint8)
            if i not in sampled:
                m[0, 0, 0] = 1  # rare class only where the batch can't see it
            write_raster(mask_dir / f"t_{i}.tif", m)

        # independent fastai simulation (test-local, not the library code)
        files = sorted(mask_dir.glob("*.tif"))
        np.random.seed(seed)
        batch_idx = np.random.permutation(len(files))[:bs]
        batch = np.concatenate(
            [read_raster(files[i]).data.astype(np.int64).ravel() for i in batch_idx])
        uniq, counts = np.unique(batch, return_counts=True)
        expected = [float(counts.sum() / c) for c in counts]
        assert list(uniq) == [0, 2]  # class 1 absent from the sampled batch

        quirky = compute_class_weights(base, 3, max_tiles=bs,
                                       reference_quirks=True, seed=seed)
        assert quirky == expected  # exact, not approximate
        assert len(quirky) == 2  # short vector, misaligned with codes


class TestAugmentQuirks:
    """already covered in round 1; keep the off-by-one pinned here too"""

    def test_n_transform_one_augments_nothing(self):
        assert n_augmented(8, 1.0, reference_quirks=True) == 0
        assert n_augmented(8, 1.0, reference_quirks=False) == 8
        assert n_augmented(8, 0.5, reference_quirks=True) == 4


class TestSpecificClassZeroGate:
    """predict.py:245-249 gates the large_file int8 stretch on TRUTHY
    specific_class — selecting class 0 behaves like no selection there."""

    def test_gate_semantics(self):
        # the gate logic itself (unit level; e2e covered in test_predict)
        for quirks, sc, expected in [
            (False, 0, True), (False, None, False), (False, 2, True),
            (True, 0, False), (True, None, False), (True, 2, True),
        ]:
            gate = bool(sc) if quirks else (sc is not None)
            assert gate == expected
