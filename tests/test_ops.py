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
        got = blend_tiles_xla(mosaic, tiles, jnp.asarray(rows), jnp.asarray(cols))
        np.testing.assert_allclose(np.asarray(got), _ref_blend(mosaic, tiles, rows, cols), rtol=1e-6)

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
