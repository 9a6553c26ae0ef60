"""tpu_opt quality gates for the advertised breadth (VERDICT r2 item 1).

The headline bench advertises tpu_opt on configurations beyond the main
aerial gate (BENCH_NOTES "Breadth": 5-band 215 t/s, xresnet50 100.9 t/s) —
each advertised configuration gets its own quality floor here so a tpu_opt
regression in any of them fails CI:

* xresnet50 (expansion-4 bottleneck decoder walk)
* regression mode (RGBI → nDSM height map, the reference's canopy-height
  use case; folded sub-pixel head in MSE mode)
* self_attention=True (spectral-normed SA inside the slim decoder)

The main 5-band multiclass gates (multi-seed, 14 epochs) live in
test_quality_parity.py; these breadth runs use a smaller scene/epoch budget
with floors pinned from the recorded runs in PARITY.md §Quality-breadth.
Floors sit ~0.05 below recorded so seed jitter passes but a real
regression (recorded−floor ≳ 2× observed jitter) fails.
"""

import csv

import numpy as np
import pytest

from aerial_fixture import make_scene
from unet_tpu.geo import write_raster
from unet_tpu.tiling import split_raster
from unet_tpu.train import TrainerConfig, train_model

T = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)
SIZE = 256
TILE = 64
CODES = ["nodata", "ground", "trees", "buildings", "water"]

# recorded (see PARITY.md §Quality-breadth) − margin
XR50_DICE_FLOOR = 0.85   # recorded .9290 @4ep (.9448 @8ep)
REGRESSION_R2_FLOOR = 0.80
SA_DICE_FLOOR = 0.90     # recorded .9652 @8ep


@pytest.fixture(scope="module")
def breadth_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("breadth")
    img, cls = make_scene(SIZE, seed=11)
    write_raster(root / "scene.tif", img, transform=T, crs="EPSG:25833")
    write_raster(root / "mask.tif", cls[None], transform=T, crs="EPSG:25833")
    base = root / "tiles"
    n = split_raster(str(root / "scene.tif"), str(root / "mask.tif"),
                     str(base), patch_size=TILE, patch_overlap=0.2,
                     split=[0.8, 0.2], max_empty=0.9, seed=1)
    assert n >= 12
    return root, base


def _train_best(base, model_path, desc, epochs=8, **kw):
    cfg = TrainerConfig(
        data_path=base, model_path=model_path, description=desc,
        batch_size=4, epochs=epochs, lr=3e-3, codes=CODES,
        class_weights="weighted", loss_func="focal", bf16=False, seed=0,
        transforms=True, tpu_opt=True, **kw,
    )
    bundle = train_model(cfg)
    rows = list(csv.DictReader((bundle / f"{desc}_history.csv").open()))
    return bundle, rows


@pytest.mark.slow
class TestTpuOptBreadth:
    def test_xresnet50_clears_dice_floor(self, breadth_scene, tmp_path):
        """Expansion-4 encoder → the tpu_opt decoder walk sizes from
        1024-wide bottleneck features (models/unet.py decoder diet).

        Pinned to ONE device: on this 1-core CI rig a 4-virtual-device mesh
        running xresnet50 can miss XLA's 40 s collective-rendezvous window
        (threads starve) — an environment limit, not a sharding property
        (test_sharding_invariance covers mesh math)."""
        import jax

        root, base = breadth_scene
        # 4 epochs (~3 min/epoch on this rig): the recorded 8-epoch run hits
        # dice .83 by epoch 2; a broken expansion-4 walk sits near chance
        _, rows = _train_best(base, tmp_path, "b50", arch="xresnet50",
                              epochs=4, devices=jax.devices()[:1])
        best = max(float(r["dice_multi"]) for r in rows)
        print(f"\nxresnet50 tpu_opt best dice={best:.3f}")
        assert best >= XR50_DICE_FLOOR, f"xresnet50 tpu_opt dice {best}"

    def test_self_attention_clears_dice_floor(self, breadth_scene, tmp_path):
        """SA sits in the third-from-last up-block on tpu_opt's slim
        widths; spectral norm power iteration runs in batch_stats."""
        root, base = breadth_scene
        _, rows = _train_best(base, tmp_path, "bsa", arch="xresnet18",
                              self_attention=True)
        best = max(float(r["dice_multi"]) for r in rows)
        print(f"\nself_attention tpu_opt best dice={best:.3f}")
        assert best >= SA_DICE_FLOOR, f"SA tpu_opt dice {best}"

    def test_regression_clears_r2_floor(self, tmp_path_factory, tmp_path):
        """Regression mode under tpu_opt (reference enable_regression,
        params_and_main.py:47): MSE on the folded sub-pixel head, rmse/R²
        metrics, best-restore on r2_score.

        Target = affine map of the NOISY reflectance bands (0.6·NIR+0.4·R)
        — exactly inferable, so the gate pins the full numeric path
        (int16 scaling → folded MSE → metrics) rather than world knowledge:
        the fixture's nDSM assigns buildings RANDOM appearance-independent
        heights, which no model can regress (measured: parity and tpu_opt
        both score r2 < 0 on it — see PARITY.md §Quality-breadth)."""
        root = tmp_path_factory.mktemp("regr")
        img, _ = make_scene(SIZE, seed=11)
        rgbi = img[:4]
        target = ((0.6 * img[3] + 0.4 * img[0]).astype(np.float32) / 4000.0)[None]
        write_raster(root / "scene.tif", rgbi, transform=T, crs="EPSG:25833")
        write_raster(root / "mask.tif", target, transform=T, crs="EPSG:25833")
        base = root / "tiles"
        split_raster(str(root / "scene.tif"), str(root / "mask.tif"),
                     str(base), patch_size=TILE, patch_overlap=0.2,
                     split=[0.8, 0.2], max_empty=1.0, seed=1)
        # bs2×25ep ≈ 250 steps (continuous targets need far more steps
        # than the boundary-task dice gates — recorded r2 .887 at ep19);
        # normalize="unit": the reference's int16÷255 scaling puts inputs
        # at 0..15.7, which conditions MSE training badly (measured: r2
        # stays < 0 on even an affine target) — unit scaling is the
        # documented regression recipe (PARITY.md §Quality-breadth)
        cfg = TrainerConfig(
            data_path=base, model_path=tmp_path, description="bregr",
            batch_size=2, epochs=25, lr=3e-3, arch="xresnet18",
            codes=["v"], regression=True, bf16=False, seed=0,
            transforms=True, tpu_opt=True, normalize="unit",
        )
        bundle = train_model(cfg)
        rows = list(csv.DictReader((bundle / "bregr_history.csv").open()))
        best = max(float(r["r2_score"]) for r in rows)
        print(f"\nregression tpu_opt best r2={best:.3f}")
        assert best >= REGRESSION_R2_FLOOR, f"regression tpu_opt r2 {best}"
