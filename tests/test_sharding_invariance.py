"""Data-parallel sharding must not change the math.

The 8-device mesh shards the batch and lets GSPMD sync BatchNorm statistics
and insert the gradient all-reduce (parallel/mesh.py); the loss trajectory
must therefore match a 1-device run of the same seed/data to float
tolerance. A divergence means a sharding bug (per-shard BN stats, missed
psum, loader order dependence) — exactly the class of bug the multi-chip
dryrun alone can't catch (VERDICT round 2, item 6).
"""

import jax
import numpy as np
import pytest

from unet_tpu.geo import write_raster

T = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)


@pytest.fixture
def tiny_tiles(tmp_path, rng):
    for scene, n in (("trai", 16), ("vali", 8)):
        (tmp_path / scene / "img_tiles").mkdir(parents=True)
        (tmp_path / scene / "mask_tiles").mkdir(parents=True)
        for i in range(n):
            img = rng.integers(0, 255, size=(3, 32, 32)).astype(np.uint8)
            msk = rng.integers(0, 3, size=(1, 32, 32)).astype(np.uint8)
            write_raster(tmp_path / scene / "img_tiles" / f"s_{i}.tif", img, transform=T)
            write_raster(tmp_path / scene / "mask_tiles" / f"s_{i}.tif", msk, transform=T)
    return tmp_path


def _run(data_path, model_path, devices):
    from unet_tpu.train.loop import Trainer, TrainerConfig

    cfg = TrainerConfig(
        data_path=data_path, model_path=model_path, description="inv",
        batch_size=8, epochs=2, lr=1e-3, arch="xresnet18",
        codes=["a", "b", "c"], tpu_opt=True, bf16=False, seed=0,
        devices=devices,
    )
    trainer = Trainer(cfg)
    try:
        _, history = trainer.fit()
    finally:
        trainer.close()
    return history


def test_loss_trajectory_matches_one_device(tiny_tiles, tmp_path):
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    h1 = _run(tiny_tiles, tmp_path / "m1", jax.devices()[:1])
    h8 = _run(tiny_tiles, tmp_path / "m8", jax.devices())
    assert len(h1) == len(h8) == 2
    for r1, r8 in zip(h1, h8):
        # f32 on CPU: only reduction-order noise may differ across meshes
        np.testing.assert_allclose(r1["train_loss"], r8["train_loss"],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(r1["valid_loss"], r8["valid_loss"],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(r1["dice_multi"], r8["dice_multi"],
                                   rtol=2e-3, atol=2e-4)
