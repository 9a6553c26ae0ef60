"""Spatial partitioning: tile height sharded over the mesh's `space` axis.

The reference caps patch size by single-GPU RAM (params_and_main.py:51
"batch size 3 @ 400px on a P100"); a (data, space) mesh lets one patch span
chips — GSPMD inserts conv halo exchanges and turns batch-norm statistic
reduces into cross-chip all-reduces from the sharding annotation alone
(parallel/mesh.py). These tests pin that the spatially partitioned program
computes the SAME function as the unsharded one, forward and training, for
both topologies.

float32 is used for equality: under bf16 the sharded program's different
fusion boundaries legally round differently, which an untrained net's
near-tied softmax amplifies (measured ~2e-6 max diff in f32 vs O(0.1) in
bf16 on random weights — rounding, not logic).
"""

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.models import build_unet
from unet_tpu.parallel.mesh import (SPACE_AXIS, batch_sharding, data_size,
                                    make_mesh, pad_to_multiple,
                                    replicate_tree, shard_batch, spatial_size)


def _forward_fn(model):
    return jax.jit(
        lambda v, x: jax.nn.softmax(model.apply(v, x, train=False), -1))


class TestMesh:
    def test_make_mesh_shapes(self):
        m1 = make_mesh(jax.devices())
        assert dict(m1.shape) == {"data": 8}
        assert data_size(m1) == 8 and spatial_size(m1) == 1
        m2 = make_mesh(jax.devices(), spatial=4)
        assert dict(m2.shape) == {"data": 2, "space": 4}
        assert data_size(m2) == 2 and spatial_size(m2) == 4
        assert SPACE_AXIS in m2.axis_names

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            make_mesh(jax.devices(), spatial=3)

    def test_pad_to_multiple_uses_data_axis(self):
        m = make_mesh(jax.devices(), spatial=4)  # data=2
        assert pad_to_multiple(3, m) == 4
        assert pad_to_multiple(4, m) == 4

    def test_batch_sharding_spec(self):
        m = make_mesh(jax.devices(), spatial=2)
        assert tuple(batch_sharding(m).spec) == ("data", "space")


class TestSpatialForward:
    @pytest.mark.parametrize("tpu_opt", [True, False])
    def test_forward_matches_unsharded(self, tpu_opt):
        model = build_unet("xresnet18", n_out=3, c_in=3, dtype=jnp.float32,
                           tpu_opt=tpu_opt)
        x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
        v = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(0), jnp.asarray(x))
        fwd = _forward_fn(model)
        ref = fwd(v, jnp.asarray(x))
        mesh = make_mesh(jax.devices(), spatial=4)  # data=2 x space=4
        got = fwd(replicate_tree(mesh, v), shard_batch(mesh, x))
        assert got.sharding.is_equivalent_to(batch_sharding(mesh), got.ndim)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)


class TestSpatialTraining:
    def _make_tiles(self, base: Path, batch: int, tile: int = 64):
        from unet_tpu.geo import tiff as tiff_codec

        rng = np.random.default_rng(0)
        for split in ("trai", "vali"):
            (base / split / "img_tiles").mkdir(parents=True)
            (base / split / "mask_tiles").mkdir(parents=True)
            for i in range(batch):
                img = rng.integers(0, 255, (3, tile, tile)).astype(np.uint8)
                msk = rng.integers(0, 3, (tile, tile)).astype(np.uint8)
                tiff_codec.write(str(base / split / "img_tiles" / f"t_{i}.tif"), img)
                tiff_codec.write(str(base / split / "mask_tiles" / f"t_{i}.tif"), msk)

    def test_train_step_matches_data_parallel(self, tmp_path):
        """One production train step + eval on a (2,4) mesh vs the 1-D
        8-device mesh: identical batches must give the same loss/metrics
        (f32 tolerance — only the partitioning differs)."""
        from unet_tpu.parallel.mesh import prefetch_to_mesh
        from unet_tpu.train.loop import Trainer, TrainerConfig

        batch = 4
        self._make_tiles(tmp_path, batch)
        losses, metrics = [], []
        for spatial in (1, 4):
            cfg = TrainerConfig(
                data_path=tmp_path, model_path=tmp_path / f"m{spatial}",
                description="sp", batch_size=batch, epochs=1, lr=1e-4,
                arch="xresnet18", codes=["a", "b", "c"], tpu_opt=True,
                bf16=False, seed=0, spatial=spatial,
            )
            trainer = Trainer(cfg)
            try:
                assert spatial_size(trainer.mesh) == spatial
                state = trainer.init_state()
                train_step, eval_step = trainer._build_steps(trainer.tx)
                images, masks, _ = next(iter(
                    prefetch_to_mesh(trainer.train_loader, trainer.mesh)))
                state, loss = train_step(state, images, masks,
                                         jax.random.PRNGKey(1))
                losses.append(float(jax.block_until_ready(loss)))
                metrics.append(trainer.evaluate(state, eval_step))
            finally:
                trainer.close()
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
        np.testing.assert_allclose(metrics[0]["valid_loss"],
                                   metrics[1]["valid_loss"], rtol=1e-4)


@pytest.fixture(scope="module")
def trained_bundle(tmp_path_factory):
    """One tiny tpu_opt bundle shared by the Predictor-side spatial tests."""
    from unet_tpu.train.loop import TrainerConfig, train_model

    base = tmp_path_factory.mktemp("spatial_bundle")
    TestSpatialTraining()._make_tiles(base, batch=2)
    cfg = TrainerConfig(
        data_path=base, model_path=base / "m", description="sp",
        batch_size=2, epochs=1, lr=1e-3, arch="xresnet18",
        codes=["a", "b", "c"], tpu_opt=True, seed=0)
    return train_model(cfg)


class TestSpatialPredictor:
    def test_predict_raster_spatial_equals_single(self, trained_bundle, tmp_path):
        """serve --spatial N must produce the same mosaic as spatial=1."""
        from unet_tpu.geo import tiff as tiff_codec
        from unet_tpu.predict.predict import predict_raster

        scene = np.random.default_rng(3).integers(
            0, 255, (3, 128, 128)).astype(np.uint8)
        scene_path = str(tmp_path / "scene.tif")
        tiff_codec.write(scene_path, scene,
                         transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
        outs = []
        for spatial in (1, 2):
            arr, _, _ = predict_raster(
                str(trained_bundle), scene_path, None, patch_size=64,
                batch_size=2, spatial=spatial)
            outs.append(np.asarray(arr))
        # class maps may differ only where bf16 rounding flips a near-tie
        agree = float(np.mean(outs[0] == outs[1]))
        assert agree > 0.99, f"spatial mosaic agreement {agree}"

    def test_predictor_mesh_layout(self, trained_bundle):
        """Predictor device selection: 8 devices / spatial=4 -> (2,4) mesh."""
        from unet_tpu.predict.predict import Predictor

        p = Predictor(str(trained_bundle), batch_size=2, spatial=4)
        assert dict(p.mesh.shape) == {"data": 2, "space": 4}
        probs = p.predict_batch(np.zeros((2, 64, 64, 3), np.uint8))
        assert probs.shape == (2, 64, 64, 3)
        with pytest.raises(ValueError):
            Predictor(str(trained_bundle), batch_size=2, spatial=16)
