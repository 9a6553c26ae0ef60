import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.data import (
    AugmentConfig,
    NOOP_AUGMENT,
    TileDataset,
    TileLoader,
    augment_batch,
    get_datatype,
    get_mask_path,
    get_patch_size,
    n_augmented,
    resolve_class_weights,
)
from unet_tpu.geo import write_raster

T = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)


@pytest.fixture
def dataset_dir(tmp_path, rng):
    """trai: 10 tiles, vali: 4 tiles, 3 bands, 3 classes."""
    for scene, n in (("trai", 10), ("vali", 4)):
        (tmp_path / scene / "img_tiles").mkdir(parents=True)
        (tmp_path / scene / "mask_tiles").mkdir(parents=True)
        for i in range(n):
            img = rng.integers(0, 255, size=(3, 32, 32)).astype(np.uint8)
            msk = rng.integers(0, 3, size=(1, 32, 32)).astype(np.uint8)
            write_raster(tmp_path / scene / "img_tiles" / f"s_{i}.tif", img, transform=T)
            write_raster(tmp_path / scene / "mask_tiles" / f"s_{i}.tif", msk, transform=T)
    return tmp_path


class TestDataset:
    def test_split_by_folder(self, dataset_dir):
        ds = TileDataset(dataset_dir)
        assert ds.n_train == 10 and ds.n_valid == 4
        assert all(f.parent.parent.name == "vali" for f in ds.valid_files)

    def test_mask_pairing(self, dataset_dir):
        ds = TileDataset(dataset_dir)
        img, msk = ds.load_pair(ds.train_files[0])
        # images AND class masks keep their storage dtype (1 byte/px stays
        # 1 byte/px through the host→device transfer); the jitted step
        # widens labels to int32 on device
        assert img.shape == (3, 32, 32) and img.dtype == np.uint8
        assert msk.shape == (32, 32) and msk.dtype == np.uint8
        assert "mask_tiles" in str(get_mask_path(ds.train_files[0]))

    def test_float_stored_class_mask_widens(self, tmp_path, rng):
        # a float-stored classification mask still becomes integer labels
        # (the reference's MaskBlock long conversion)
        for d in ("img_tiles", "mask_tiles"):
            (tmp_path / "trai" / d).mkdir(parents=True)
        img = rng.integers(0, 255, size=(3, 8, 8)).astype(np.uint8)
        msk = rng.integers(0, 3, size=(1, 8, 8)).astype(np.float32)
        write_raster(tmp_path / "trai" / "img_tiles" / "a.tif", img, transform=T)
        write_raster(tmp_path / "trai" / "mask_tiles" / "a.tif", msk, transform=T)
        ds = TileDataset(tmp_path, valid_scenes=())
        _, m = ds.load_pair(ds.train_files[0])
        assert m.dtype == np.int32

    def test_datatype_detection_int8(self, dataset_dir):
        assert get_datatype(dataset_dir) == "int8"

    def test_datatype_detection_int16(self, tmp_path, rng):
        (tmp_path / "trai" / "img_tiles").mkdir(parents=True)
        img = rng.integers(0, 60000, size=(3, 16, 16)).astype(np.uint16)
        write_raster(tmp_path / "trai" / "img_tiles" / "a.tif", img)
        assert get_datatype(tmp_path) == "int16"

    def test_patch_size(self, dataset_dir):
        width, res, dtype, bands = get_patch_size(dataset_dir)
        assert width == 32 and bands == 3
        assert res == (pytest.approx(0.2), pytest.approx(0.2))


class TestLoader:
    def test_train_batches_drop_last(self, dataset_dir):
        ds = TileDataset(dataset_dir)
        dl = TileLoader(ds, ds.train_files, batch_size=4, shuffle=True, drop_last=True, seed=0)
        batches = list(dl)
        assert len(batches) == 2  # 10 // 4
        imgs, msks, n_valid = batches[0]
        assert imgs.shape == (4, 32, 32, 3) and msks.shape == (4, 32, 32)
        assert n_valid == 4

    def test_valid_batches_padded(self, dataset_dir):
        ds = TileDataset(dataset_dir)
        dl = TileLoader(ds, ds.valid_files, batch_size=3, shuffle=False)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[1][2] == 1  # 4 = 3 + 1 → last batch 1 real sample
        assert batches[1][0].shape[0] == 3  # padded to full batch

    def test_shuffle_varies_by_epoch(self, dataset_dir):
        ds = TileDataset(dataset_dir)
        dl = TileLoader(ds, ds.train_files, batch_size=10, shuffle=True, seed=1)
        a = next(iter(dl))[0]
        b = next(iter(dl))[0]
        assert not np.array_equal(a, b)


class TestClassWeights:
    def test_even(self):
        w = resolve_class_weights("even", ["a", "b", "c"])
        np.testing.assert_allclose(w, [1 / 3] * 3)

    def test_weighted_inverse_frequency(self, dataset_dir):
        w = resolve_class_weights("weighted", ["a", "b", "c"], data_path=dataset_dir)
        assert len(w) == 3 and all(v > 0 for v in w)
        # roughly uniform data → weights near n_classes... (total/count ≈ 3)
        assert all(2.0 < v < 4.5 for v in w)

    def test_explicit_list(self):
        assert resolve_class_weights([1, 2, 3], ["a", "b", "c"]) == [1.0, 2.0, 3.0]

    def test_regression_single(self):
        assert resolve_class_weights("weighted", ["a"], regression=True) == [1.0]

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            resolve_class_weights([1, 2], ["a", "b", "c"])


class TestAugment:
    def _batch(self, rng, b=4, h=16, w=16, c=3):
        imgs = jnp.asarray(rng.integers(0, 255, size=(b, h, w, c)).astype(np.float32))
        msks = jnp.asarray(rng.integers(0, 3, size=(b, h, w)).astype(np.int32))
        return imgs, msks

    def test_noop_scaling_int16(self, rng):
        imgs, msks = self._batch(rng)
        out, m = augment_batch(jax.random.PRNGKey(0), imgs, msks, NOOP_AUGMENT,
                               dtype_str="int16", normalize="reference")
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs) / 255.0, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(msks))

    def test_int8_reference_passthrough(self, rng):
        imgs, msks = self._batch(rng)
        out, _ = augment_batch(jax.random.PRNGKey(0), imgs, msks, NOOP_AUGMENT,
                               dtype_str="int8", normalize="reference")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))

    def test_unit_normalize(self, rng):
        imgs, msks = self._batch(rng)
        out, _ = augment_batch(jax.random.PRNGKey(0), imgs, msks, NOOP_AUGMENT,
                               dtype_str="int8", normalize="unit")
        assert float(np.max(np.asarray(out))) <= 1.0

    def test_flip_applies_jointly_to_image_and_mask(self, rng):
        imgs, msks = self._batch(rng)
        cfg = AugmentConfig(hflip_p=1.0, vflip_p=0.0)
        out_i, out_m = augment_batch(jax.random.PRNGKey(0), imgs, msks, cfg,
                                     n_transform_imgs=1.0, dtype_str="int8")
        np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs)[:, :, ::-1])
        np.testing.assert_array_equal(np.asarray(out_m), np.asarray(msks)[:, :, ::-1])

    def test_partial_batch_augmented(self, rng):
        imgs, msks = self._batch(rng, b=4)
        cfg = AugmentConfig(hflip_p=1.0, vflip_p=0.0)
        out_i, _ = augment_batch(jax.random.PRNGKey(0), imgs, msks, cfg,
                                 n_transform_imgs=0.5, dtype_str="int8")
        np.testing.assert_array_equal(np.asarray(out_i)[:2], np.asarray(imgs)[:2, :, ::-1])
        np.testing.assert_array_equal(np.asarray(out_i)[2:], np.asarray(imgs)[2:])

    def test_n_augmented_rounding_and_quirk(self):
        assert n_augmented(4, 0.5) == 2
        assert n_augmented(4, 0.3) == 2  # ceil(1.2)
        assert n_augmented(4, 1.0) == 4
        assert n_augmented(4, 1.0, reference_quirks=True) == 0  # reference bug
        with pytest.raises(ValueError):
            n_augmented(4, 1.5)

    def test_split_idx_gating(self, rng):
        imgs, msks = self._batch(rng)
        cfg = AugmentConfig(hflip_p=1.0, vflip_p=0.0)
        # split_idx=0: no augmentation on valid batches (scaling only)
        out_i, _ = augment_batch(jax.random.PRNGKey(0), imgs, msks, cfg,
                                 split="valid", split_idx=0, dtype_str="int8")
        np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs))
        # split_idx=None: augment both
        out_i, _ = augment_batch(jax.random.PRNGKey(0), imgs, msks, cfg,
                                 split="valid", split_idx=None, dtype_str="int8")
        np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs)[:, :, ::-1])

    def test_brightness_contrast_changes_only_augmented(self, rng):
        imgs, msks = self._batch(rng)
        cfg = AugmentConfig(hflip_p=0.0, vflip_p=0.0, brightness_contrast_p=1.0,
                            brightness_limit=(0.1, 0.1), contrast_limit=(0.0, 0.0))
        out_i, _ = augment_batch(jax.random.PRNGKey(0), imgs, msks, cfg,
                                 n_transform_imgs=0.5, dtype_str="int8")
        np.testing.assert_allclose(np.asarray(out_i)[:2], np.asarray(imgs)[:2] + 25.5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_i)[2:], np.asarray(imgs)[2:])

    def test_coarse_dropout_zeroes_regions(self, rng):
        imgs, msks = self._batch(rng, h=32, w=32)
        imgs = imgs + 1.0  # ensure strictly positive
        cfg = AugmentConfig(hflip_p=0.0, vflip_p=0.0, coarse_dropout_p=1.0)
        out_i, out_m = augment_batch(jax.random.PRNGKey(3), imgs, msks, cfg,
                                     n_transform_imgs=1.0, dtype_str="int8")
        assert np.sum(np.asarray(out_i) == 0) > 0
        np.testing.assert_array_equal(np.asarray(out_m), np.asarray(msks))  # mask untouched

    def test_int16_quirk_scale(self, rng):
        imgs, msks = self._batch(rng, b=2)
        out_i, _ = augment_batch(jax.random.PRNGKey(0), imgs, msks, NOOP_AUGMENT,
                                 n_transform_imgs=0.5, dtype_str="int16",
                                 reference_quirks=True)
        np.testing.assert_allclose(np.asarray(out_i)[0], np.asarray(imgs)[0] * (255.0 / 65535.0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out_i)[1], np.asarray(imgs)[1] / 255.0, rtol=1e-5)

    def test_rot90_joint(self, rng):
        imgs, msks = self._batch(rng)
        cfg = AugmentConfig(hflip_p=0.0, vflip_p=0.0, rot90_p=1.0)
        out_i, out_m = augment_batch(jax.random.PRNGKey(5), imgs, msks, cfg,
                                     n_transform_imgs=1.0, dtype_str="int8")
        # each image rotated by some k∈{1,2,3}; mask must match the same k
        for b in range(imgs.shape[0]):
            matched = False
            for k in (1, 2, 3):
                if np.array_equal(np.asarray(out_i)[b], np.rot90(np.asarray(imgs)[b], k, (0, 1))):
                    assert np.array_equal(np.asarray(out_m)[b], np.rot90(np.asarray(msks)[b], k, (0, 1)))
                    matched = True
            assert matched, f"image {b} is not a rotation of the input"

    def test_saturation(self, rng):
        imgs, msks = self._batch(rng)
        cfg = AugmentConfig(hflip_p=0.0, vflip_p=0.0, saturation_p=1.0,
                            saturation_limit=(-0.5, -0.5))
        out_i, _ = augment_batch(jax.random.PRNGKey(6), imgs, msks, cfg,
                                 n_transform_imgs=1.0, dtype_str="int8")
        # saturation 0.5: channels pulled toward the per-pixel gray mean
        gray = np.mean(np.asarray(imgs), axis=-1, keepdims=True)
        want = gray + (np.asarray(imgs) - gray) * 0.5
        np.testing.assert_allclose(np.asarray(out_i), want, rtol=1e-4, atol=1e-3)

    def test_fused_path_matches_jnp_path(self, rng):
        """The Pallas fused flip/scale path (interpret mode) must produce
        exactly what the jnp path produces for the same key."""
        imgs, msks = self._batch(rng, b=4, h=32, w=32)
        cfg = AugmentConfig(hflip_p=0.5, vflip_p=0.5)
        key = jax.random.PRNGKey(42)
        ref_i, ref_m = augment_batch(key, imgs, msks, cfg, n_transform_imgs=1.0,
                                     dtype_str="int16", use_fused=False)
        import unet_tpu.ops.pallas_aug as pa
        orig = pa.fused_flip_scale
        try:
            pa.fused_flip_scale = lambda *a, **k: orig(*a, interpret=True, **{kk: vv for kk, vv in k.items() if kk != "interpret"})
            got_i, got_m = augment_batch(key, imgs, msks, cfg, n_transform_imgs=1.0,
                                         dtype_str="int16", use_fused=True)
        finally:
            pa.fused_flip_scale = orig
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))


class TestLoaderDeterminism:
    def test_same_seed_same_order(self, dataset_dir):
        ds = TileDataset(dataset_dir)
        a = TileLoader(ds, ds.train_files, batch_size=4, shuffle=True, drop_last=True, seed=5)
        b = TileLoader(ds, ds.train_files, batch_size=4, shuffle=True, drop_last=True, seed=5)
        for (ia, ma, _), (ib, mb, _) in zip(a, b):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(ma, mb)


class TestEinsumFlips:
    """Large batches route flips through MXU permutation matmuls
    (augment._flip_images); the result must be BIT-exact vs lax.rev for
    floats and lossless for integer masks."""

    def test_float_and_int_exact(self):
        from unet_tpu.data.augment import _flip_images

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal((3, 64, 512, 4)).astype(np.float32))
        msk = jnp.asarray(rng.integers(0, 7, (3, 64, 512)).astype(np.int32))
        flags = jnp.asarray([True, False, True])
        assert img.size >= (1 << 16)  # einsum path engaged
        for axis in (1, 2):
            got = _flip_images(img, flags, axis)
            want = jnp.where(flags[:, None, None, None],
                             jnp.flip(img, axis=axis), img)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
            got_m = _flip_images(msk, flags, axis)
            want_m = jnp.where(flags[:, None, None],
                               jnp.flip(msk, axis=axis), msk)
            assert got_m.dtype == msk.dtype
            np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


class TestLoaderRace:
    def test_concurrent_loaders_decide_once(self, dataset_dir):
        """Regression: prefetch futures race the one-time native-vs-python
        decoder decision; a worker must never observe the native handle
        flipping to None mid-decode (loader.py _decide_lock)."""
        ds = TileDataset(dataset_dir)
        for _ in range(10):
            a = TileLoader(ds, ds.train_files, batch_size=4, shuffle=True,
                           drop_last=True, seed=5)
            b = TileLoader(ds, ds.train_files, batch_size=4, shuffle=True,
                           drop_last=True, seed=5)
            for (ia, ma, _), (ib, mb, _) in zip(a, b):
                np.testing.assert_array_equal(ia, ib)
                np.testing.assert_array_equal(ma, mb)
            a.close()
            b.close()


class TestDevicePrefetch:
    """prefetch_to_mesh: double-buffered h2d (VERDICT r2 item 2)."""

    def test_yields_sharded_batches_in_order(self):
        from unet_tpu.parallel.mesh import (DATA_AXIS, make_mesh,
                                            prefetch_to_mesh)

        mesh = make_mesh()
        n_dev = mesh.devices.size
        batches = [
            (np.full((n_dev * 2, 4, 4, 3), i, np.uint8),
             np.full((n_dev * 2, 4, 4), i, np.uint8), n_dev * 2)
            for i in range(5)
        ]
        out = list(prefetch_to_mesh(batches, mesh, depth=2))
        assert len(out) == 5
        for i, (img, msk, n_valid) in enumerate(out):
            assert n_valid == n_dev * 2
            assert isinstance(img, jax.Array)
            spec = img.sharding.spec
            assert spec[0] == DATA_AXIS
            np.testing.assert_array_equal(np.asarray(img), batches[i][0])
            np.testing.assert_array_equal(np.asarray(msk), batches[i][1])

    def test_none_masks_and_empty_iterable(self):
        from unet_tpu.parallel.mesh import make_mesh, prefetch_to_mesh

        mesh = make_mesh()
        n_dev = mesh.devices.size
        out = list(prefetch_to_mesh(
            [(np.zeros((n_dev, 2, 2, 1), np.float32), None, n_dev)], mesh))
        assert len(out) == 1 and out[0][1] is None
        assert list(prefetch_to_mesh([], mesh)) == []

    def test_transfer_overlaps_iteration(self):
        """The generator issues the NEXT transfer before yielding the
        current batch: the producing iterator must have been advanced
        beyond the consumed item while we hold it."""
        from unet_tpu.parallel.mesh import make_mesh, prefetch_to_mesh

        mesh = make_mesh()
        n_dev = mesh.devices.size
        produced = []

        def gen():
            for i in range(4):
                produced.append(i)
                yield np.zeros((n_dev, 2, 2, 1), np.float32), None, n_dev

        it = prefetch_to_mesh(gen(), mesh, depth=2)
        first = next(it)
        # depth=2 primes two transfers; pulling one item schedules a third
        assert len(produced) >= 2
        del first, it
