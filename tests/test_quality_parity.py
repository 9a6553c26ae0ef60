"""Quality gates on the realistic aerial fixture (VERDICT r2 item 1).

The reference's north star is segmentation quality on multi-band aerial
scenes (BASELINE.md: "mIoU parity on a held-out aerial scene"). These
tests drive the production configuration end-to-end on a realistic
synthetic: **5-band RGBI+nDSM** uint16 scene, imbalanced 5-class mask,
nodata edge → split_raster → weighted class weights + focal loss + flip
augmentation → training → prediction+merge mosaic → dice/mIoU floors.

Floors are REGRESSION PINS set ~0.03-0.05 below values recorded across
seeds (PARITY.md §Quality) — tight enough that a real quality regression
fails, loose enough for CPU seed jitter:

* parity topology (tpu_opt=False), 14 epochs — recorded over seeds
  {0,1,2}: dice .966/.966/.970, mosaic mIoU .960/.967/.968 (CI re-runs
  seed 0; the multi-seed evidence is recorded in PARITY.md).
* tpu_opt (the DEFAULT topology), seeds {0,1,2} at **20 epochs** — the
  slim no-blur decoder converges a few epochs later than parity on this
  tiny dataset (at 14 epochs seed variance reached dice .76-.96; at 20
  epochs every seed recovers — recorded values in PARITY.md). Each seed
  trains and must clear the same floors, so a quality regression in ANY
  seed fails CI, not just a lucky one.

Breadth configurations (xresnet50, regression, self-attention) are gated
in test_quality_breadth.py.
"""

import csv

import numpy as np
import pytest

from aerial_fixture import class_iou, make_scene
from unet_tpu.geo import read_raster, write_raster
from unet_tpu.predict import save_predictions
from unet_tpu.tiling import split_raster
from unet_tpu.train import TrainerConfig, train_model

T = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)
SIZE = 384
TILE = 128
CODES = ["nodata", "ground", "trees", "buildings", "water"]

# parity topology, 14 epochs, recorded min over 3 seeds: dice .9663 / mIoU .9597
PARITY_DICE_FLOOR = 0.93
PARITY_MIOU_FLOOR = 0.93
# tpu_opt, 20 epochs, recorded min over 3 seeds (see PARITY.md §Quality)
TPU_OPT_DICE_FLOOR = 0.90
TPU_OPT_MIOU_FLOOR = 0.93
TPU_OPT_EPOCHS = 20
TPU_OPT_SEEDS = (0, 1, 2)


@pytest.fixture(scope="module")
def aerial_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("aerial")
    img, cls = make_scene(SIZE, seed=4)
    ip, mp = root / "scene.tif", root / "mask.tif"
    write_raster(ip, img, transform=T, crs="EPSG:25833")
    write_raster(mp, cls[None], transform=T, crs="EPSG:25833")

    base = root / "tiles"
    n = split_raster(str(ip), str(mp), str(base), patch_size=TILE,
                     patch_overlap=0.2, split=[0.8, 0.2], max_empty=0.9, seed=1)
    assert n >= 9
    pred_base = root / "pred"
    split_raster(str(ip), None, str(pred_base), patch_size=TILE,
                 patch_overlap=0.2, max_empty=1.0)
    return root, cls, base, pred_base


def _train_and_mosaic(root, cls, base, pred_base, desc, *, seed, epochs,
                      tpu_opt):
    cfg = TrainerConfig(
        data_path=base, model_path=root / "models", description=desc,
        batch_size=4, epochs=epochs, lr=3e-3, arch="xresnet18",
        codes=CODES, class_weights="weighted", loss_func="focal",
        bf16=False, seed=seed, transforms=True, tpu_opt=tpu_opt,
    )
    bundle = train_model(cfg)
    rows = list(csv.DictReader((bundle / f"{desc}_history.csv").open()))
    best_dice = max(float(r["dice_multi"]) for r in rows)
    out = save_predictions(str(bundle), str(pred_base / "img_tiles"),
                           merge=True, AOI=desc, year="2026", batch_size=4)
    pred = read_raster(out).data[0]
    assert pred.shape == cls.shape
    ious, miou = class_iou(pred, cls, len(CODES))
    detail = {CODES[c]: round(v, 3) for c, v in ious.items()}
    print(f"\n{desc}: dice={best_dice:.3f} mosaic mIoU={miou:.3f} "
          f"per-class={detail}")
    return bundle, best_dice, miou, detail


@pytest.mark.slow
class TestAerialQuality:
    @pytest.fixture(scope="class")
    def parity_run(self, aerial_scene):
        root, cls, base, pred_base = aerial_scene
        return aerial_scene, _train_and_mosaic(
            root, cls, base, pred_base, "aerial", seed=0, epochs=14,
            tpu_opt=False)

    def test_parity_topology_floors(self, parity_run):
        _, (bundle, dice, miou, detail) = parity_run
        assert dice >= PARITY_DICE_FLOOR, f"parity dice {dice} below floor"
        assert miou >= PARITY_MIOU_FLOOR, \
            f"parity mIoU {miou:.3f} below floor ({detail})"

    @pytest.mark.parametrize("seed", TPU_OPT_SEEDS)
    def test_tpu_opt_matches_floors(self, aerial_scene, seed):
        """The flagship (DEFAULT) tpu_opt topology — folded stem,
        conv-transpose upsampling, slim 128-lane decoder, folded-logits
        loss — must clear near-parity floors on EVERY seed; this is the
        gate that licenses tpu_opt as the default topology
        (models/unet.py, models/xresnet.py)."""
        root, cls, base, pred_base = aerial_scene
        _, dice, miou, detail = _train_and_mosaic(
            root, cls, base, pred_base, f"aerial_tpu_s{seed}", seed=seed,
            epochs=TPU_OPT_EPOCHS, tpu_opt=True)
        assert dice >= TPU_OPT_DICE_FLOOR, \
            f"tpu_opt seed {seed} dice {dice} below floor"
        assert miou >= TPU_OPT_MIOU_FLOOR, \
            f"tpu_opt seed {seed} mIoU {miou:.3f} below floor ({detail})"

    def test_weighted_weights_reflect_imbalance(self, parity_run):
        import json

        _, (bundle, _, _, _) = parity_run
        manifest = json.loads((bundle / "aerial.json").read_text())
        w = manifest["resolved_class_weights"]
        assert len(w) == len(CODES)
        assert all(np.isfinite(v) and v >= 0 for v in w)
        # rare classes get larger inverse-frequency weights than common ones
        # (which rare class tops depends on the train-tile sample, so compare
        # a rare class against the dominant one with a wide margin)
        assert w[CODES.index("water")] > 2 * w[CODES.index("ground")]
        assert w[CODES.index("buildings")] > w[CODES.index("ground")]
