"""CLI front-end: ``python -m unet_tpu <command> [args]``.

The reference has no CLI — configuration is editing module constants in
params_and_main.py. This front-end keeps that workflow (``run`` on a JSON
config with the same field names) and adds direct subcommands.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .api import Params, main, main_multi, params_from_json


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="unet_tpu",
                                 description="TPU-native aerial segmentation pipeline")
    sub = ap.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="run stages from a JSON params file")
    run.add_argument("config", help="JSON file with Params fields")
    run.add_argument("--multi", action="store_true", help="list-broadcast multi-run mode")

    tile = sub.add_parser("tile", help="split a GeoTIFF into training tiles")
    tile.add_argument("image")
    tile.add_argument("--mask", default=None)
    tile.add_argument("--base-dir", required=True)
    tile.add_argument("--patch-size", type=int, default=400)
    tile.add_argument("--patch-overlap", type=float, default=0.0)
    tile.add_argument("--split", type=float, nargs="+", default=[0.8, 0.2])
    tile.add_argument("--max-empty", type=float, default=0.9)
    tile.add_argument("--class-zero", action="store_true")
    tile.add_argument("--seed", type=int, default=None)
    tile.add_argument("--reference-quirks", action="store_true")
    tile.add_argument("--compress", default=None,
                      choices=["none", "deflate", "lzw", "packbits", "jpeg", "jpeg-lossless"],
                      help="tile output compression (img tiles; masks keep "
                           "exact labels — lossy jpeg maps to deflate for "
                           "them)")

    tr = sub.add_parser("train", help="train a model on a tile dataset")
    tr.add_argument("data_path")
    tr.add_argument("--model-path", required=True)
    tr.add_argument("--description", default="model")
    tr.add_argument("--codes", nargs="+", default=["Background", "Class_1"])
    tr.add_argument("--arch", default="xresnet34")
    tr.add_argument("--batch-size", type=int, default=4)
    tr.add_argument("--epochs", type=int, default=15)
    tr.add_argument("--lr", type=float, default=1e-4)
    tr.add_argument("--regression", action="store_true")
    tr.add_argument("--class-weights", default="even")
    tr.add_argument("--self-attention", action="store_true")
    tr.add_argument("--existing-model", default=None)
    tr.add_argument("--lr-finder", default=None)
    tr.add_argument("--pretrained-weights", default=None,
                    help="torch .pth or converted .npz (see import-weights)")
    tr.add_argument("--tpu-opt", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="TPU-optimized topology (s2d stem, slim decoder, "
                         "half-res tail) — the default; --no-tpu-opt selects "
                         "the reference-shaped parity topology")
    tr.add_argument("--grad-accum", type=int, default=1,
                    help="split each batch into N sequential microbatches "
                         "inside the jitted step: effective batches beyond "
                         "one chip's HBM (BN uses microbatch statistics)")
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--reference-quirks", action="store_true")
    tr.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace of the first epoch here")
    tr.add_argument("--coordinator", default=None,
                    help="multi-host training: coordinator host:port "
                         "(run the same command on every host)")
    tr.add_argument("--num-processes", type=int, default=None,
                    help="multi-host: total number of host processes")
    tr.add_argument("--process-id", type=int, default=None,
                    help="multi-host: this host's rank (0-based)")

    pr = sub.add_parser("predict", help="predict tiles with a trained bundle")
    pr.add_argument("model")
    pr.add_argument("tiles")
    pr.add_argument("--merge", action="store_true")
    pr.add_argument("--regression", action="store_true")
    pr.add_argument("--all-classes", action="store_true")
    pr.add_argument("--specific-class", type=int, default=None)
    pr.add_argument("--large-file", action="store_true")
    pr.add_argument("--aoi", default=None)
    pr.add_argument("--year", default=None)
    pr.add_argument("--validation-vision", action="store_true")
    pr.add_argument("--class-zero", action="store_true",
                    help="0 = nodata: decrement classes on write "
                         "(reference predict.py:32-35)")
    pr.add_argument("--device-merge", action="store_true",
                    help="accumulate the merge mosaic in HBM (overlap-blend "
                         "on device) instead of per-tile host round trips")
    pr.add_argument("--batch-size", type=int, default=16)
    pr.add_argument("--spatial", type=int, default=1,
                    help="shard tile height over this many devices (GSPMD "
                         "halo exchange) for tiles too big for one chip")
    pr.add_argument("--tta", action="store_true",
                    help="4-fold flip test-time augmentation (averaged "
                         "probabilities; 4x forward cost)")
    pr.add_argument("--reference-quirks", action="store_true")
    pr.add_argument("--compress", default=None,
                    choices=["none", "deflate", "lzw", "packbits", "jpeg", "jpeg-lossless"],
                    help="output compression for prediction tiles / the "
                         "merged mosaic")

    sv = sub.add_parser("serve", help="predict whole GeoTIFFs directly (no tile files)")
    sv.add_argument("model")
    sv.add_argument("raster", nargs="+",
                    help="one or more scene GeoTIFFs; with several, OUTPUT "
                         "is a directory and the model stays resident")
    sv.add_argument("output")
    sv.add_argument("--patch-size", type=int, default=None)
    sv.add_argument("--patch-overlap", type=float, default=0.2)
    sv.add_argument("--batch-size", type=int, default=16)
    sv.add_argument("--regression", action="store_true")
    sv.add_argument("--all-classes", action="store_true")
    sv.add_argument("--specific-class", type=int, default=None)
    sv.add_argument("--class-zero", action="store_true",
                    help="0 = nodata: decrement classes on write")
    sv.add_argument("--spatial", type=int, default=1,
                    help="shard patch height over this many devices (GSPMD "
                         "halo exchange) for patches too big for one chip")
    sv.add_argument("--tta", action="store_true",
                    help="4-fold flip test-time augmentation (averaged "
                         "probabilities; 4x forward cost)")
    sv.add_argument("--compress", default=None,
                    choices=["none", "deflate", "lzw", "packbits", "jpeg", "jpeg-lossless"],
                    help="output mosaic compression")
    sv.add_argument("--stream", action="store_true",
                    help="force the O(band)-memory streamed path (windowed "
                         "reads, strip-streamed output); automatic for "
                         "scenes whose mosaic would exceed host RAM")

    dr = sub.add_parser("doctor", help="diagnose the environment: devices, "
                                       "mesh, native decoder, codecs, cache")
    dr.add_argument("--pallas", action="store_true",
                    help="also probe the Pallas kernel toolchain (compiles "
                         "two tiny kernels; slow on remote-compile rigs)")

    bench = sub.add_parser("bench", help="run the training/inference benchmark")
    bench.add_argument("--tile", type=int, default=512)
    bench.add_argument("--batch-size", type=int, default=16)
    bench.add_argument("--steps", type=int, default=20)

    ex = sub.add_parser(
        "export",
        help="freeze a trained bundle as an AOT serving artifact (.uta): "
             "the prediction program compiled to StableHLO + raw weights — "
             "loads without model-building code, no pickle, symbolic batch",
    )
    ex.add_argument("model", help="trained bundle (model_path/description)")
    ex.add_argument("output", help="artifact path (convention: .uta)")
    ex.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering targets (default cpu,tpu)")
    ex.add_argument("--patch-size", type=int, default=None,
                    help="override the manifest tile size (spatial dims are "
                         "static per artifact; batch is symbolic)")
    ex.add_argument("--quantize", choices=["int8"], default=None,
                    help="per-channel int8 weight quantization: ~4x smaller "
                         "artifact, on-device dequantization, bf16 compute")

    iw = sub.add_parser(
        "import-weights",
        help="convert a torch/fastai xresnet state_dict (.pth) to a "
             "torch-free .npz for --pretrained-weights / pretrained_weights",
    )
    iw.add_argument("state_dict", help="path to the torch .pth file")
    iw.add_argument("--arch", default="xresnet34")
    iw.add_argument("-o", "--out", default=None,
                    help="output .npz (default: <state_dict>.npz)")

    im = sub.add_parser(
        "import-model",
        help="convert a FULL trained fastai DynamicUnet state_dict (.pth) "
             "into a prediction-ready model bundle — the migration path for "
             "reference-trained models (save the .pth on any fastai machine "
             "with torch.save(learn.model.state_dict(), path))",
    )
    im.add_argument("state_dict", help="path to the torch .pth file")
    im.add_argument("bundle", help="output bundle directory "
                                   "(model_path/description)")
    im.add_argument("--description", default=None,
                    help="bundle name (default: bundle dir name)")
    im.add_argument("--patch-size", type=int, default=400,
                    help="tile size the model was trained at (reference "
                         "default 400)")
    im.add_argument("--regression", action="store_true")
    im.add_argument("--codes", nargs="*", default=None,
                    help="class names, for the manifest")
    im.add_argument("--dtype", default="int8",
                    help="training-data dtype for predict-time scaling "
                         "(int8|uint8|int16|float32; reference rule)")
    return ap


def _compress_arg(args):
    """argparse surface uses 'none' for explicit no-compression."""
    c = getattr(args, "compress", None)
    return None if c in (None, "none") else c


def _artifact_predictor(args):
    """If the model argument is a frozen .uta serving artifact, load it and
    return an ArtifactPredictor for the ``predictor=`` pass-through; None
    means the normal bundle path. Artifacts carry a sharding-free frozen
    program, so --spatial needs a live bundle."""
    from .predict import is_artifact, load_artifact

    if not is_artifact(args.model):
        return None
    if getattr(args, "spatial", 1) > 1:
        raise SystemExit(
            "--spatial needs a live model bundle (the artifact's program is "
            "frozen without sharding); export is for single-chip serving")
    return load_artifact(args.model, batch_size=args.batch_size,
                         tta=getattr(args, "tta", False))


def cli(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if os.environ.get("UNET_TPU_TRACEBACK"):
        return _dispatch(args)
    try:
        return _dispatch(args)
    except (OSError, ValueError) as e:
        # user-input errors (missing paths, bad bundles/params) get one
        # clean line; crashes in library code still raise normally
        print(f"error: {e}", file=sys.stderr)
        print("(set UNET_TPU_TRACEBACK=1 for the full traceback)",
              file=sys.stderr)
        return 2


def _dispatch(args) -> int:
    if args.command == "run":
        p = params_from_json(args.config)
        (main_multi if args.multi else main)(p)
    elif args.command == "tile":
        from .tiling import split_raster

        n = split_raster(args.image, args.mask, args.base_dir, args.patch_size,
                         args.patch_overlap, args.split, args.max_empty, args.class_zero,
                         seed=args.seed, reference_quirks=args.reference_quirks,
                         compress=_compress_arg(args))
        print(f"{n} tiles written to {args.base_dir}")
    elif args.command == "train":
        from .train.loop import TrainerConfig, train_model

        if args.coordinator or args.num_processes:
            from .parallel.mesh import init_distributed

            init_distributed(coordinator_address=args.coordinator,
                             num_processes=args.num_processes,
                             process_id=args.process_id)
        cw = args.class_weights
        if cw not in ("even", "weighted"):
            cw = json.loads(cw)
        out = train_model(TrainerConfig(
            data_path=args.data_path, model_path=args.model_path,
            description=args.description, codes=args.codes, arch=args.arch,
            batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
            regression=args.regression, class_weights=cw,
            self_attention=args.self_attention, existing_model=args.existing_model,
            lr_finder=args.lr_finder, pretrained_weights=args.pretrained_weights,
            tpu_opt=args.tpu_opt, seed=args.seed,
            grad_accum=args.grad_accum,
            reference_quirks=args.reference_quirks,
            profile_dir=args.profile_dir,
        ))
        print(f"Model bundle exported to {out}")
    elif args.command == "predict":
        from .predict import save_predictions

        out = save_predictions(args.model, args.tiles, args.regression, args.merge,
                               args.all_classes, args.specific_class, args.large_file,
                               args.aoi, args.year, args.validation_vision,
                               class_zero=args.class_zero,
                               batch_size=args.batch_size,
                               spatial=args.spatial,
                               tta=args.tta,
                               device_merge=args.device_merge,
                               reference_quirks=args.reference_quirks,
                               predictor=_artifact_predictor(args),
                               out_compress=_compress_arg(args))
        print(f"Predictions at {out}")
    elif args.command == "serve":
        if len(args.raster) > 1:
            from .predict import serve_scenes

            outs = serve_scenes(args.model, args.raster, args.output,
                                patch_size=args.patch_size,
                                patch_overlap=args.patch_overlap,
                                batch_size=args.batch_size,
                                regression=args.regression,
                                all_classes=args.all_classes,
                                specific_class=args.specific_class,
                                class_zero=args.class_zero,
                                spatial=args.spatial,
                                tta=args.tta,
                                predictor=_artifact_predictor(args),
                                out_compress=_compress_arg(args))
            print(f"{len(outs)} mosaics in {args.output}")
        elif args.stream:
            from .predict import predict_raster_streamed

            predict_raster_streamed(args.model, args.raster[0], args.output,
                                    patch_size=args.patch_size,
                                    patch_overlap=args.patch_overlap,
                                    batch_size=args.batch_size,
                                    regression=args.regression,
                                    all_classes=args.all_classes,
                                    specific_class=args.specific_class,
                                    class_zero=args.class_zero,
                                    spatial=args.spatial,
                                    tta=args.tta,
                                    predictor=_artifact_predictor(args),
                                    out_compress=_compress_arg(args))
            print(f"Mosaic streamed to {args.output}")
        else:
            from .predict import predict_raster

            arr, _, _ = predict_raster(args.model, args.raster[0], args.output,
                                       patch_size=args.patch_size,
                                       patch_overlap=args.patch_overlap,
                                       batch_size=args.batch_size,
                                       regression=args.regression,
                                       all_classes=args.all_classes,
                                       specific_class=args.specific_class,
                                       class_zero=args.class_zero,
                                       spatial=args.spatial,
                                       tta=args.tta,
                                       predictor=_artifact_predictor(args),
                                       out_compress=_compress_arg(args))
            if arr is None:
                print(f"Mosaic streamed to {args.output}")
            else:
                print(f"Mosaic {arr.shape} written to {args.output}")
    elif args.command == "doctor":
        from .utils.doctor import run_doctor

        results = run_doctor(pallas=args.pallas)
        return 0 if all(ok for ok, _ in results.values()) else 1
    elif args.command == "bench":
        from .bench import run_benchmark

        run_benchmark(tile=args.tile, batch_size=args.batch_size, steps=args.steps)
    elif args.command == "export":
        from .predict import export_artifact

        out = export_artifact(args.model, args.output,
                              platforms=args.platforms.split(","),
                              patch_size=args.patch_size,
                              quantize=args.quantize)
        print(f"Serving artifact at {out}")
    elif args.command == "import-weights":
        from .models.torch_import import import_weights_cli

        out = args.out or (str(args.state_dict).rsplit(".", 1)[0] + ".npz")
        import_weights_cli(args.state_dict, out, arch=args.arch)
    elif args.command == "import-model":
        from .models.torch_import import import_model_cli

        import_model_cli(args.state_dict, args.bundle,
                         description=args.description,
                         patch_size=args.patch_size,
                         regression=args.regression,
                         codes=args.codes,
                         dtype_str=args.dtype)
    return 0


if __name__ == "__main__":
    sys.exit(cli())
