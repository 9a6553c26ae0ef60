import numpy as np
import pytest

from unet_tpu.geo import Raster, read_raster, write_raster
from unet_tpu.tiling import align_image_and_mask, generate_windows, split_raster

T = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)


class TestWindows:
    def test_exact_grid_no_overlap(self):
        ws = generate_windows(100, 100, 50, 0.0)
        assert len(ws) == 4
        assert {w.rect() for w in ws} == {(0, 0, 50, 50), (0, 50, 50, 50), (50, 0, 50, 50), (50, 50, 50, 50)}

    def test_edge_window_appended(self):
        ws = generate_windows(130, 130, 50, 0.0)
        xs = sorted({w.x for w in ws})
        assert xs == [0, 50, 80]  # final snapped to width - win = 80

    def test_overlap_step_floor(self):
        ws = generate_windows(400, 400, 100, 0.25)
        # step = 100 - floor(25) = 75; offsets 0,75,150,225,300 (=last)
        assert sorted({w.x for w in ws}) == [0, 75, 150, 225, 300]

    def test_window_clipped_to_image(self):
        ws = generate_windows(30, 80, 50, 0.0)
        assert all(w.h == 30 and w.w == 50 for w in ws)

    def test_column_major_order(self):
        ws = generate_windows(100, 100, 50, 0.0)
        assert [w.rect()[:2] for w in ws[:2]] == [(0, 0), (0, 50)]

    def test_overlap_above_one_raises(self):
        with pytest.raises(ValueError):
            generate_windows(100, 100, 50, 1.5)


def _make_scene(tmp_path, rng, size=120, bands=3, nodata_border=10, n_classes=3):
    img = rng.integers(1, 255, size=(bands, size, size)).astype(np.uint8)
    msk = rng.integers(1, n_classes, size=(1, size, size)).astype(np.uint8)
    img[:, :nodata_border, :] = 0
    msk[:, :nodata_border, :] = 0
    ip = tmp_path / "scene.tif"
    mp = tmp_path / "mask.tif"
    write_raster(ip, img, transform=T, crs="EPSG:25833", nodata=0)
    write_raster(mp, msk, transform=T, crs="EPSG:25833", nodata=0)
    return ip, mp, img, msk


class TestSplitRaster:
    def test_layout_and_pairing(self, tmp_path, rng):
        ip, mp, _, _ = _make_scene(tmp_path, rng)
        base = tmp_path / "tiles"
        n = split_raster(str(ip), str(mp), str(base), patch_size=40, patch_overlap=0,
                         split=[0.8, 0.2], max_empty=0.9, seed=0)
        assert n > 0
        imgs = sorted(p.name for d in ("trai", "vali") for p in (base / d / "img_tiles").glob("*.tif"))
        msks = sorted(p.name for d in ("trai", "vali") for p in (base / d / "mask_tiles").glob("*.tif"))
        assert imgs == msks and len(imgs) == n
        assert not (base / "img_tiles").exists()  # source dirs cleaned up

    def test_tile_georeferencing(self, tmp_path, rng):
        ip, mp, img, _ = _make_scene(tmp_path, rng, nodata_border=0)
        base = tmp_path / "tiles"
        split_raster(str(ip), str(mp), str(base), patch_size=40, patch_overlap=0, split=[1.0, 0.0], seed=0)
        tile = next((base / "trai" / "img_tiles").glob("scene_*.tif"))
        idx = int(tile.stem.rsplit("_", 1)[1])
        r = read_raster(tile)
        # column-major index → x = (idx // 3) * 40, y = (idx % 3) * 40 on a 3x3 grid
        x, y = (idx // 3) * 40, (idx % 3) * 40
        assert r.transform[0] == pytest.approx(T[0] + x * 0.2)
        assert r.transform[3] == pytest.approx(T[3] - y * 0.2)
        np.testing.assert_array_equal(r.data, img[:, y:y + 40, x:x + 40])

    def test_max_empty_filter(self, tmp_path, rng):
        ip, mp, _, _ = _make_scene(tmp_path, rng, size=120, nodata_border=40)
        base = tmp_path / "tiles"
        # 3x3 grid of 40px tiles; top row fully nodata → dropped with strict max_empty
        n = split_raster(str(ip), str(mp), str(base), patch_size=40, patch_overlap=0,
                         split=[0.8, 0.2], max_empty=0.2, seed=0)
        assert n == 6

    def test_class_zero_shift(self, tmp_path, rng):
        ip, mp, _, msk = _make_scene(tmp_path, rng, nodata_border=20)
        base = tmp_path / "tiles"
        split_raster(str(ip), str(mp), str(base), patch_size=40, patch_overlap=0,
                     split=[1.0, 0.0], max_empty=0.9, class_zero=True, seed=0)
        vals = set()
        for p in (base / "trai" / "mask_tiles").glob("*.tif"):
            vals |= set(np.unique(read_raster(p).data).tolist())
        # original classes 1..2 shifted to 2..3; nodata stays 0
        assert vals <= {0, 2, 3}
        assert {2, 3} <= vals

    def test_patch_larger_than_image_raises(self, tmp_path, rng):
        ip, mp, _, _ = _make_scene(tmp_path, rng, size=50)
        with pytest.raises(ValueError, match="larger than the image"):
            split_raster(str(ip), str(mp), str(tmp_path / "x"), patch_size=100, patch_overlap=0)

    def test_bad_split_resets(self, tmp_path, rng):
        ip, mp, _, _ = _make_scene(tmp_path, rng, nodata_border=0)
        base = tmp_path / "tiles"
        with pytest.warns(UserWarning, match="does not sum to 1"):
            split_raster(str(ip), str(mp), str(base), patch_size=40, patch_overlap=0,
                         split=[0.5, 0.2], seed=0)
        assert (base / "test" / "img_tiles").exists()

    def test_no_mask_mode(self, tmp_path, rng):
        ip, _, _, _ = _make_scene(tmp_path, rng, nodata_border=0)
        base = tmp_path / "pred_tiles"
        n = split_raster(str(ip), None, str(base), patch_size=40, patch_overlap=0.2, split=[1.0])
        assert n == len(list((base / "img_tiles").glob("*.tif")))
        assert not (base / "trai").exists()  # no split without mask

    def test_int16_data_saved_as_uint16(self, tmp_path, rng):
        img = rng.integers(1, 4000, size=(4, 80, 80)).astype(np.uint16)
        msk = rng.integers(1, 3, size=(1, 80, 80)).astype(np.uint8)
        ip, mp = tmp_path / "i.tif", tmp_path / "m.tif"
        write_raster(ip, img, transform=T, nodata=0)
        write_raster(mp, msk, transform=T, nodata=0)
        base = tmp_path / "t"
        split_raster(str(ip), str(mp), str(base), patch_size=40, patch_overlap=0, split=[1.0, 0.0], seed=0)
        tile = next((base / "trai" / "img_tiles").glob("*.tif"))
        assert read_raster(tile).dtype == np.uint16


class TestAlignment:
    def test_shifted_mask_cropped_to_intersection(self):
        img = Raster(np.arange(3 * 100 * 100, dtype=np.uint16).reshape(3, 100, 100),
                     transform=(1000.0, 0.5, 0.0, 2000.0, 0.0, -0.5), nodata=None)
        # mask shifted 10 px right and 4 px down, same resolution
        msk = Raster(np.arange(100 * 100, dtype=np.uint8).reshape(1, 100, 100),
                     transform=(1005.0, 0.5, 0.0, 1998.0, 0.0, -0.5), nodata=None)
        ai, am = align_image_and_mask(img, msk)
        assert ai.data.shape[1:] == am.data.shape[1:] == (96, 90)
        # image cropped from (row 4, col 10); mask from (0, 0)
        np.testing.assert_array_equal(ai.data, img.data[:, 4:, 10:])
        np.testing.assert_array_equal(am.data, msk.data[:, :96, :90])
        assert ai.transform[0] == pytest.approx(1005.0)
        assert ai.transform[3] == pytest.approx(1998.0)

    def test_subpixel_offset_snapped(self):
        img = Raster(np.zeros((1, 50, 50), np.uint8), transform=(100.0, 1.0, 0.0, 100.0, 0.0, -1.0))
        msk = Raster(np.zeros((1, 50, 50), np.uint8), transform=(100.2, 1.0, 0.0, 99.9, 0.0, -1.0))
        ai, am = align_image_and_mask(img, msk)
        assert ai.data.shape == am.data.shape == (1, 50, 50)

    def test_aligned_passthrough(self):
        img = Raster(np.zeros((1, 10, 10), np.uint8), transform=T)
        msk = Raster(np.ones((1, 10, 10), np.uint8), transform=T)
        ai, am = align_image_and_mask(img, msk)
        assert ai is img and am is msk


class TestMultiScene:
    def test_two_scenes_accumulate_in_one_base_dir(self, tmp_path, rng):
        """The reference tiles multiple scenes into the same base_dir
        sequentially (create_tiles_train_predict_multi.py:136-146); tiles
        accumulate because filenames are keyed by the source image name."""
        base = tmp_path / "tiles"
        total = 0
        for name in ("sceneA", "sceneB"):
            img = rng.integers(1, 255, size=(3, 80, 80)).astype(np.uint8)
            msk = rng.integers(1, 3, size=(1, 80, 80)).astype(np.uint8)
            ip, mp = tmp_path / f"{name}.tif", tmp_path / f"{name}_m.tif"
            write_raster(ip, img, transform=T, nodata=0)
            write_raster(mp, msk, transform=T, nodata=0)
            total += split_raster(str(ip), str(mp), str(base), patch_size=40,
                                  patch_overlap=0, split=[0.8, 0.2], seed=1)
        names = [p.name for d in ("trai", "vali")
                 for p in (base / d / "img_tiles").glob("*.tif")]
        assert len(names) == total == 8
        assert any(n.startswith("sceneA") for n in names)
        assert any(n.startswith("sceneB") for n in names)


class TestInvariants:
    def test_full_coverage_property(self):
        """Every pixel is covered by at least one window for a sweep of
        sizes/overlaps (the reference relies on slidingwindow guaranteeing
        this for its prediction mosaics)."""
        rng = np.random.default_rng(9)
        for _ in range(25):
            h = int(rng.integers(40, 300))
            w = int(rng.integers(40, 300))
            patch = int(rng.integers(16, min(h, w) + 1))
            overlap = float(rng.choice([0.0, 0.1, 0.2, 0.33, 0.5]))
            cover = np.zeros((h, w), bool)
            for win in generate_windows(h, w, patch, overlap):
                rs, cs = win.indices()
                cover[rs, cs] = True
            assert cover.all(), f"gap at h={h} w={w} patch={patch} ov={overlap}"

    def test_tiling_golden_hash(self, tmp_path):
        """Deterministic end-to-end tiling fingerprint: catches silent
        regressions in window geometry, nodata zeroing, filtering, dtype
        conversion, or TIFF encoding across rounds (pure numpy — platform
        independent)."""
        import hashlib

        rng = np.random.default_rng(20260816)
        img = rng.integers(1, 255, size=(3, 100, 100)).astype(np.uint8)
        msk = rng.integers(1, 3, size=(1, 100, 100)).astype(np.uint8)
        img[:, :15, :] = 0
        msk[:, :15, :] = 0
        ip, mp = tmp_path / "g.tif", tmp_path / "gm.tif"
        write_raster(ip, img, transform=T, crs="EPSG:25833", nodata=0)
        write_raster(mp, msk, transform=T, crs="EPSG:25833", nodata=0)
        base = tmp_path / "tiles"
        split_raster(str(ip), str(mp), str(base), patch_size=40, patch_overlap=0.25,
                     split=[1.0, 0.0], max_empty=0.5, seed=77)
        h = hashlib.sha256()
        for p in sorted(base.rglob("*.tif")):
            h.update(p.name.encode())
            h.update(p.read_bytes())
        # re-pinned 2026-08-19 (2nd): the CRS-conformance change added
        # citation + linear-units GeoKeys to synthesized EPSG key sets
        # (geo/tiff.py, VERDICT r3 #1) after the previous pin; key-level
        # correctness is asserted independently in tests/test_crs.py and the
        # PIL decode check below validates the pin at pixel level.
        assert h.hexdigest() == "75fe1bb07d5b4f6ba49e6dcb93c4dbfcb1ab4e18c374dec40166d29cc71c79b8"
        # Self-validating pin: independently decode one 3-band tile with PIL
        # and assert photometric interpretation + pixel equality, so a silent
        # writer regression can't be baked into a future hash re-pin.
        from PIL import Image
        from unet_tpu.geo import read_raster
        tile = sorted((base / "trai" / "img_tiles").glob("*.tif"))[0]
        with Image.open(tile) as im:
            assert im.mode == "RGB", im.mode  # photometric=RGB honored by PIL
            pil_arr = np.moveaxis(np.asarray(im), 2, 0)
        ours = read_raster(tile).data
        np.testing.assert_array_equal(pil_arr, ours)
