#!/usr/bin/env python
"""Flagship end-to-end quality run on real TPU hardware (dev tool).

Trains the benchmarked flagship config (xresnet34, tpu_opt, 512² tiles,
5-band RGBI+nDSM) on the realistic aerial fixture and reports per-epoch
wall time plus final mosaic mIoU — tying the synthetic-throughput headline
(bench.py) and the CPU quality gates (tests/test_quality_*.py) together in
one artifact on the same hardware the bench runs on.

The dataset is a 2048² fixture scene split into 512² tiles through the real
tile→train→predict pipeline (reference flow: params_and_main.py Create_tiles
→ Train → Predict). Numbers land in BENCH_NOTES.md.

Run on an idle machine (the 1-core host serializes everything):
    python tools/realchip_quality.py [--epochs 16] [--size 2048]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=16)
    # 3072² → 36 tiles → 27 train at the 0.75 split (> the bs16 flagship
    # batch; 2048² gave only 12 train tiles and Trainer refuses bs16)
    ap.add_argument("--size", type=int, default=3072)
    ap.add_argument("--arch", default="xresnet34")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--parity", action="store_true",
                    help="run the reference-shaped topology instead")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (init/aug streams); scene stays "
                         "fixed so seeds are comparable")
    args = ap.parse_args()

    from aerial_fixture import class_iou, make_scene

    from unet_tpu.geo import tiff
    from unet_tpu.tiling.split import split_raster
    from unet_tpu.train.loop import TrainerConfig, train_model

    work = Path(tempfile.mkdtemp(prefix="realchip_quality_"))
    img, mask = make_scene(size=args.size, seed=0)
    transform = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)
    tiff.write(str(work / "scene.tif"), img, transform=transform,
               crs="EPSG:25832")
    tiff.write(str(work / "mask.tif"), mask[None], transform=transform,
               crs="EPSG:25832")

    tiles = work / "tiles"
    split_raster(str(work / "scene.tif"), str(work / "mask.tif"),
                 str(tiles), patch_size=512, patch_overlap=0.0,
                 split=(0.75, 0.25), max_empty=1.0)

    cfg = TrainerConfig(
        data_path=str(tiles), model_path=str(work / "models"),
        description="realchip", codes=["nodata", "ground", "trees",
                                       "buildings", "water"],
        arch=args.arch, batch_size=args.batch_size, epochs=args.epochs,
        lr=2e-3, class_weights="weighted", tpu_opt=not args.parity,
        seed=args.seed,
    )
    t0 = time.perf_counter()
    bundle = train_model(cfg)
    train_s = time.perf_counter() - t0

    # mosaic quality on the full scene through the real predict path
    from unet_tpu.predict.predict import predict_raster

    t0 = time.perf_counter()
    pred, _, _ = predict_raster(str(bundle), str(work / "scene.tif"),
                                patch_size=512, patch_overlap=0.2,
                                batch_size=args.batch_size)
    predict_s = time.perf_counter() - t0
    pred = np.squeeze(pred)
    ious, miou = class_iou(pred, mask, 5)

    history = (bundle / "realchip_history.csv").read_text().strip().splitlines()
    n_train = len(list((tiles / "trai" / "img_tiles").glob("*.tif")))
    out = {
        "config": f"{args.arch} {'parity' if args.parity else 'tpu_opt'} "
                  f"512^2 bs{args.batch_size} x{args.epochs}ep "
                  f"seed{args.seed}",
        "train_tiles": n_train,
        "train_wall_s": round(train_s, 1),
        "epoch_s": round(train_s / args.epochs, 2),
        "predict_wall_s": round(predict_s, 1),
        "mosaic_miou": round(miou, 4),
        "per_class_iou": {str(k): round(float(v), 4) for k, v in ious.items()},
        "history_tail": history[-1] if len(history) > 1 else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
