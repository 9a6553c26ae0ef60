import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.ops.blend import DeviceMosaic, blend_tiles, blend_tiles_xla


def _ref_blend(mosaic, tiles, rows, cols):
    m = np.array(mosaic)
    for t, r, c in zip(np.asarray(tiles), rows, cols):
        m[r:r + t.shape[0], c:c + t.shape[1], :] += t
    return m


class TestBlend:
    def test_xla_blend_matches_numpy(self, rng):
        mosaic = jnp.zeros((64, 64, 3), jnp.float32)
        tiles = jnp.asarray(rng.normal(size=(5, 16, 16, 3)).astype(np.float32))
        rows = np.array([0, 0, 48, 8, 24], np.int32)
        cols = np.array([0, 48, 0, 8, 24], np.int32)
        # blend_tiles_xla donates its mosaic arg — compute the reference first
        ref = _ref_blend(mosaic, tiles, rows, cols)
        got = blend_tiles_xla(mosaic, tiles, jnp.asarray(rows), jnp.asarray(cols))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)

    def test_pallas_blend_interpret_matches(self, rng):
        mosaic = jnp.zeros((64, 64, 4), jnp.float32)
        tiles = jnp.asarray(rng.normal(size=(4, 32, 32, 4)).astype(np.float32))
        rows = np.array([0, 16, 32, 0], np.int32)
        cols = np.array([0, 16, 32, 32], np.int32)
        got = blend_tiles(mosaic, tiles, jnp.asarray(rows), jnp.asarray(cols), interpret=True)
        np.testing.assert_allclose(np.asarray(got), _ref_blend(
            jnp.zeros((64, 64, 4), jnp.float32), tiles, rows, cols), rtol=1e-6)

    def test_overlapping_tiles_accumulate(self, rng):
        mosaic = jnp.zeros((32, 32, 2), jnp.float32)
        tiles = jnp.ones((3, 16, 16, 2), jnp.float32)
        rows = np.array([0, 0, 8], np.int32)
        cols = np.array([0, 8, 4], np.int32)
        got = blend_tiles(mosaic, tiles, jnp.asarray(rows), jnp.asarray(cols), interpret=True)
        want = _ref_blend(jnp.zeros((32, 32, 2), jnp.float32), tiles, rows, cols)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
        assert np.asarray(got).max() == 3.0  # triple overlap at center

    def test_device_mosaic_counts(self, rng):
        dm = DeviceMosaic(32, 48, n_classes=3, use_pallas=False)
        probs = jnp.asarray(rng.random(size=(2, 16, 16, 3)).astype(np.float32))
        dm.add_batch(probs, np.array([0, 8]), np.array([0, 8]))
        summed, counter = dm.finalize()
        assert summed.shape == (3, 32, 48)
        assert counter.shape == (32, 48)
        assert counter[0, 0] == 1 and counter[12, 12] == 2 and counter[30, 40] == 0


class TestFusedFlipScale:
    def _data(self, rng, b=4, h=32, w=16, c=3):
        imgs = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        msks = jnp.asarray(rng.integers(0, 3, size=(b, h, w)).astype(np.int32))
        return imgs, msks

    def _reference(self, imgs, msks, hf, vf, scales):
        out_i = np.array(imgs)
        out_m = np.array(msks)
        for b in range(imgs.shape[0]):
            if hf[b]:
                out_i[b] = out_i[b, :, ::-1]
                out_m[b] = out_m[b, :, ::-1]
            if vf[b]:
                out_i[b] = out_i[b, ::-1]
                out_m[b] = out_m[b, ::-1]
            out_i[b] *= scales[b]
        return out_i, out_m

    def test_all_flag_combinations(self, rng):
        from unet_tpu.ops.pallas_aug import fused_flip_scale

        imgs, msks = self._data(rng, b=4)
        hf = np.array([False, True, False, True])
        vf = np.array([False, False, True, True])
        scales = np.array([1.0, 0.5, 2.0, 1.0 / 255], np.float32)
        got_i, got_m = fused_flip_scale(imgs, msks, jnp.asarray(hf), jnp.asarray(vf),
                                        jnp.asarray(scales), interpret=True)
        want_i, want_m = self._reference(imgs, msks, hf, vf, scales)
        np.testing.assert_allclose(np.asarray(got_i), want_i, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_m), want_m)

    def test_multi_row_block_mirroring(self, rng):
        """Heights with several row blocks exercise the mirrored index map."""
        from unet_tpu.ops.pallas_aug import fused_flip_scale

        imgs, msks = self._data(rng, b=2, h=64, w=8)
        hf = np.array([False, True])
        vf = np.array([True, True])
        scales = np.ones(2, np.float32)
        got_i, got_m = fused_flip_scale(imgs, msks, jnp.asarray(hf), jnp.asarray(vf),
                                        jnp.asarray(scales), interpret=True)
        want_i, want_m = self._reference(imgs, msks, hf, vf, scales)
        np.testing.assert_allclose(np.asarray(got_i), want_i, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_m), want_m)

    def test_no_mask(self, rng):
        from unet_tpu.ops.pallas_aug import fused_flip_scale

        imgs, _ = self._data(rng, b=2)
        got_i, got_m = fused_flip_scale(imgs, None, jnp.asarray([True, False]),
                                        jnp.asarray([False, False]),
                                        jnp.ones(2, jnp.float32), interpret=True)
        assert got_m is None
        np.testing.assert_allclose(np.asarray(got_i)[0], np.asarray(imgs)[0, :, ::-1], rtol=1e-6)


class TestBlockedBlend:
    """blend_tiles_blocked: the Pallas path verified correct on real TPU
    hardware (BENCH_NOTES.md); interpret-mode equivalence pinned here."""

    def test_matches_xla_scan_random_overlaps(self, rng):
        from unet_tpu.ops.blend import blend_tiles_blocked, blend_tiles_xla

        H, W, th, tw, C, n = 96, 160, 32, 32, 3, 11
        mosaic0 = rng.normal(size=(H, W, C)).astype(np.float32)
        tiles = rng.normal(size=(n, th, tw, C)).astype(np.float32)
        rows = rng.integers(0, H - th + 1, n)
        cols = rng.integers(0, W - tw + 1, n)
        ref = blend_tiles_xla(jnp.asarray(mosaic0), jnp.asarray(tiles),
                              jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32))
        got = blend_tiles_blocked(jnp.asarray(mosaic0.copy()), jnp.asarray(tiles),
                                  rows, cols, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grid_aligned_offsets(self, rng):
        """Tiles exactly on the block grid (single-quadrant case)."""
        from unet_tpu.ops.blend import blend_tiles_blocked, blend_tiles_xla

        H = W = 64
        th = tw = 32
        tiles = rng.normal(size=(4, th, tw, 2)).astype(np.float32)
        rows = np.array([0, 0, 32, 32])
        cols = np.array([0, 32, 0, 32])
        ref = blend_tiles_xla(jnp.zeros((H, W, 2)), jnp.asarray(tiles),
                              jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32))
        got = blend_tiles_blocked(jnp.zeros((H, W, 2)), jnp.asarray(tiles),
                                  rows, cols, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)

    def test_mosaic_must_be_block_multiple(self, rng):
        from unet_tpu.ops.blend import blend_tiles_blocked

        with pytest.raises(ValueError, match="not a multiple"):
            blend_tiles_blocked(jnp.zeros((40, 64, 2)),
                                jnp.zeros((1, 32, 32, 2)),
                                np.array([0]), np.array([0]), interpret=True)

    def test_device_mosaic_padded_finalize(self, rng):
        """DeviceMosaic pads to block multiples and crops on finalize."""
        from unet_tpu.ops.blend import DeviceMosaic

        dm = DeviceMosaic(50, 70, n_classes=2, use_pallas=False)
        probs = rng.random(size=(2, 32, 32, 2)).astype(np.float32)
        dm.add_batch(jnp.asarray(probs), np.array([0, 18]), np.array([0, 38]))
        summed, counter = dm.finalize()
        assert summed.shape == (2, 50, 70) and counter.shape == (50, 70)
        assert counter[0, 0] == 1 and counter[20, 40] == 1
        assert counter[49, 69] == 1 and counter[0, 69] == 0  # (18,38)+32 covers (49,69)


class TestShiftBlend:
    """blend_tiles_shift: the 1.1×-amplification in-kernel-shift design
    (interpret-verified; blocked on the axon platform's scalar-DMA crash —
    see the kernel docstring + BENCH_NOTES.md)."""

    def test_matches_reference_random(self):
        from unet_tpu.ops.blend import blend_tiles_shift

        rng = np.random.default_rng(7)
        H, W, C, th, tw, n = 264, 320, 4, 64, 64, 9  # 8 spare rows
        L = W * C + 128  # 128 spare lanes
        tiles = rng.random((n, th, tw * C)).astype(np.float32)
        rows = rng.integers(0, 256 - th + 1, n)
        cols = rng.integers(0, W - tw + 1, n)
        out = blend_tiles_shift(jnp.zeros((H, L), jnp.float32),
                                jnp.asarray(tiles), rows, cols * C,
                                interpret=True)
        ref = np.zeros((H, L), np.float32)
        for i in range(n):
            ref[rows[i]:rows[i] + th, cols[i] * C:(cols[i] + tw) * C] += tiles[i]
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_edge_windows_need_spare(self):
        from unet_tpu.ops.blend import blend_tiles_shift

        tiles = jnp.ones((1, 64, 256), jnp.float32)
        with pytest.raises(ValueError, match="spare lanes"):
            blend_tiles_shift(jnp.zeros((72, 256), jnp.float32), tiles,
                              np.array([0]), np.array([0]), interpret=True)
        with pytest.raises(ValueError, match="spare rows"):
            blend_tiles_shift(jnp.zeros((64, 384), jnp.float32), tiles,
                              np.array([0]), np.array([0]), interpret=True)


class TestPallasProbe:
    """ops/probe.py: central gating for the custom kernels (VERDICT r2 #9)."""

    def test_cpu_platform_probes_false_and_caches(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UNET_TPU_PROBE_CACHE", str(tmp_path / "probe.json"))
        import importlib

        from unet_tpu.ops import probe

        importlib.reload(probe)
        assert probe.scalar_prefetch_dma_supported() is False  # cpu backend
        assert probe.fused_aug_enabled() is False
        assert probe.blend_kernel_enabled() is False
        d = probe.describe()
        assert d["scalar_prefetch_dma"] is False
        assert "toolchain" in d
        # cached on disk, keyed by toolchain
        import json

        disk = json.loads((tmp_path / "probe.json").read_text())
        assert disk["scalar_prefetch_dma"] is False

    def test_ab_record_drives_enablement(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UNET_TPU_PROBE_CACHE", str(tmp_path / "probe.json"))
        import importlib

        from unet_tpu.ops import probe

        importlib.reload(probe)
        # simulate a toolchain where the probe passes
        probe._CACHE = {"toolchain": probe._toolchain_key(),
                        "scalar_prefetch_dma": True}
        probe._store(probe._CACHE)
        assert probe.fused_aug_enabled() is False  # no A/B yet
        probe.record_kernel_ab("fused_aug", 1.0, 2.0)  # kernel faster
        assert probe.fused_aug_enabled() is True
        probe.record_kernel_ab("blend", 3.0, 2.0)  # kernel slower
        assert probe.blend_kernel_enabled() is False

    def test_env_override_wins(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UNET_TPU_PROBE_CACHE", str(tmp_path / "probe.json"))
        monkeypatch.setenv("UNET_TPU_FUSED_AUG", "1")
        import importlib

        from unet_tpu.ops import probe

        importlib.reload(probe)
        assert probe.fused_aug_enabled() is True
        monkeypatch.setenv("UNET_TPU_FUSED_AUG", "0")
        assert probe.fused_aug_enabled() is False


class TestProbeTransientErrors:
    """A tunnel/RPC outage during the probe must NOT be persisted as a
    per-toolchain capability verdict (a real bench run cached
    scalar_prefetch_dma=false during a hiccup; re-probing clean said
    true)."""

    def test_classification(self):
        from unet_tpu.ops import probe

        # compiler rejections → cacheable False
        assert probe._classify_probe_error(
            "INTERNAL: Mosaic failed to compile TPU kernel") is False
        assert probe._classify_probe_error(
            "NotImplementedError: unsupported lowering") is False
        # transport/transient → None
        assert probe._classify_probe_error(
            "ConnectionError: tunnel reset by peer") is None
        assert probe._classify_probe_error(
            "XlaRuntimeError: UNAVAILABLE: HTTP 502 from compile "
            "service") is None

    def test_transient_not_persisted(self, tmp_path, monkeypatch):
        import importlib
        import json

        from unet_tpu.ops import probe

        monkeypatch.setenv("UNET_TPU_PROBE_CACHE",
                           str(tmp_path / "probe.json"))
        importlib.reload(probe)
        monkeypatch.setattr(probe, "_on_tpu", lambda: True)
        monkeypatch.setattr(probe, "_probe_scalar_prefetch_dma",
                            lambda: None)
        assert probe.scalar_prefetch_dma_supported() is False  # this process
        assert not (tmp_path / "probe.json").exists() or \
            "scalar_prefetch_dma" not in json.loads(
                (tmp_path / "probe.json").read_text())
        assert probe.describe().get("probe_transient") is True
        # a later process with a healthy platform gets the real verdict
        importlib.reload(probe)
        monkeypatch.setattr(probe, "_on_tpu", lambda: True)
        monkeypatch.setattr(probe, "_probe_scalar_prefetch_dma",
                            lambda: True)
        assert probe.scalar_prefetch_dma_supported() is True
        assert json.loads((tmp_path / "probe.json").read_text())[
            "scalar_prefetch_dma"] is True
