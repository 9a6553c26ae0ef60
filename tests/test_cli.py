import json

import numpy as np
import pytest

from unet_tpu.geo import write_raster

T = (500000.0, 0.2, 0.0, 5400000.0, 0.0, -0.2)


@pytest.fixture
def scene(tmp_path, rng):
    img = rng.integers(1, 255, size=(3, 100, 100)).astype(np.uint8)
    msk = rng.integers(1, 3, size=(1, 100, 100)).astype(np.uint8)
    ip, mp = tmp_path / "s.tif", tmp_path / "m.tif"
    write_raster(ip, img, transform=T, nodata=0)
    write_raster(mp, msk, transform=T, nodata=0)
    return tmp_path, ip, mp


class TestApiMain:
    def test_main_create_tiles_stage(self, scene):
        from unet_tpu.api import Params, main

        root, ip, mp = scene
        base = root / "tiles"
        main(Params(Create_tiles=True, image_path=str(ip), mask_path=str(mp),
                    base_dir=str(base), patch_size=50, patch_overlap=0,
                    split=[0.8, 0.2], enable_extra_parameters=True, max_empty=0.9))
        assert len(list((base / "trai" / "img_tiles").glob("*.tif"))) > 0
        assert len(list((base / "vali" / "img_tiles").glob("*.tif"))) > 0

    def test_main_multi_broadcasts_tiling(self, scene, rng):
        from unet_tpu.api import Params, main_multi

        root, ip, mp = scene
        bases = [str(root / "t1"), str(root / "t2")]
        main_multi(Params(Create_tiles=True, image_path=[str(ip), str(ip)],
                          mask_path=[str(mp)], base_dir=bases, patch_size=50,
                          patch_overlap=0, split=[0.8, 0.2],
                          enable_extra_parameters=True, max_empty=0.9))
        for b in bases:
            assert len(list((root / b / "trai" / "img_tiles").glob("*.tif"))) > 0


class TestCli:
    def test_tile_subcommand(self, scene, capsys):
        from unet_tpu.__main__ import cli

        root, ip, mp = scene
        rc = cli(["tile", str(ip), "--mask", str(mp), "--base-dir", str(root / "ct"),
                  "--patch-size", "50", "--split", "0.8", "0.2"])
        assert rc == 0
        assert "tiles written" in capsys.readouterr().out

    def test_run_subcommand_with_json(self, scene, capsys):
        from unet_tpu.__main__ import cli

        root, ip, mp = scene
        cfg = {"Create_tiles": True, "image_path": str(ip), "mask_path": str(mp),
               "base_dir": str(root / "jt"), "patch_size": 50, "patch_overlap": 0,
               "split": [0.8, 0.2]}
        f = root / "params.json"
        f.write_text(json.dumps(cfg))
        rc = cli(["run", str(f)])
        assert rc == 0
        assert (root / "jt" / "trai" / "img_tiles").exists()

    def test_parser_covers_all_stages(self):
        from unet_tpu.__main__ import build_parser

        p = build_parser()
        for cmd in ("run", "tile", "train", "predict", "bench"):
            assert cmd in p._subparsers._group_actions[0].choices


def test_serve_multi_scene_parser():
    """serve accepts several rasters; one raster keeps the classic form."""
    from unet_tpu.__main__ import build_parser

    ap = build_parser()
    a = ap.parse_args(["serve", "m", "a.tif", "b.tif", "outdir"])
    assert a.raster == ["a.tif", "b.tif"] and a.output == "outdir"
    b = ap.parse_args(["serve", "m", "a.tif", "out.tif", "--stream"])
    assert b.raster == ["a.tif"] and b.output == "out.tif" and b.stream


def test_predict_serve_expose_class_zero_and_device_merge():
    """The reference drives class_zero through prediction
    (params_and_main.py:94, predict.py:32-35); the CLI must be able to
    reproduce that workflow, and the device-side merge is reachable too."""
    from unet_tpu.__main__ import build_parser

    ap = build_parser()
    a = ap.parse_args(["predict", "m", "tiles", "--merge", "--class-zero",
                       "--device-merge"])
    assert a.class_zero and a.device_merge
    d = ap.parse_args(["predict", "m", "tiles"])
    assert not d.class_zero and not d.device_merge
    s = ap.parse_args(["serve", "m", "a.tif", "out.tif", "--class-zero"])
    assert s.class_zero


def test_predict_cli_class_zero_applied(tmp_path, rng, monkeypatch):
    """--class-zero actually reaches save_predictions (not just the parser)."""
    from unet_tpu import __main__ as m

    captured = {}

    def fake_save(*args, **kw):
        captured.update(kw)
        captured["args"] = args
        return tmp_path

    monkeypatch.setattr("unet_tpu.predict.save_predictions", fake_save)
    m.cli(["predict", "model", "tiles", "--class-zero", "--device-merge"])
    assert captured["class_zero"] is True
    assert captured["device_merge"] is True


def test_train_multihost_flags_parse():
    """Multi-host bring-up is CLI-reachable (init_distributed wiring)."""
    from unet_tpu.__main__ import build_parser

    args = build_parser().parse_args(
        ["train", "d", "--model-path", "m", "--coordinator", "host:1234",
         "--num-processes", "2", "--process-id", "1"])
    assert args.coordinator == "host:1234"
    assert args.num_processes == 2 and args.process_id == 1
    # absent by default so single-host runs skip jax.distributed entirely
    args = build_parser().parse_args(["train", "d", "--model-path", "m"])
    assert args.coordinator is None and args.num_processes is None


class TestDoctor:
    def test_doctor_cli_passes_here(self, capsys):
        from unet_tpu.__main__ import cli

        assert cli(["doctor"]) == 0
        out = capsys.readouterr().out
        for name in ("versions", "devices", "mesh", "native decoder",
                     "optional deps", "compile cache"):
            assert name in out
        assert "all checks passed" in out

    def test_doctor_isolates_failures(self, monkeypatch, capsys):
        """A failing check reports, never raises, and flips the exit code."""
        from unet_tpu.__main__ import cli
        from unet_tpu.utils import doctor

        def boom():
            raise RuntimeError("decoder exploded")

        monkeypatch.setattr(doctor, "_native", boom)
        assert cli(["doctor"]) == 1
        out = capsys.readouterr().out
        assert "FAIL" in out and "decoder exploded" in out
        assert "all checks passed" not in out


class TestCLIErrorUX:
    """User-input mistakes get one clean `error:` line and exit code 2,
    not a traceback (UNET_TPU_TRACEBACK=1 restores the raw traceback)."""

    def test_missing_bundle_clean_error(self, capsys, monkeypatch):
        from unet_tpu import __main__ as m

        monkeypatch.delenv("UNET_TPU_TRACEBACK", raising=False)
        rc = m.cli(["predict", "models/NOPE", "tiles"])
        err = capsys.readouterr().err
        assert rc == 2
        assert err.startswith("error: ")
        assert "UNET_TPU_TRACEBACK" in err

    def test_missing_tiles_clean_error(self, capsys, monkeypatch):
        from unet_tpu import __main__ as m

        monkeypatch.delenv("UNET_TPU_TRACEBACK", raising=False)
        rc = m.cli(["tile", "/no/such/scene.tif", "--base-dir", "x"])
        assert rc == 2
        assert capsys.readouterr().err.startswith("error: ")

    def test_traceback_escape_hatch(self, monkeypatch):
        import pytest as _pytest

        from unet_tpu import __main__ as m

        monkeypatch.setenv("UNET_TPU_TRACEBACK", "1")
        with _pytest.raises(FileNotFoundError):
            m.cli(["tile", "/no/such/scene.tif", "--base-dir", "x"])


class TestOutputCompression:
    """--compress ties the geo codec's write side into the product
    surface (tile outputs + prediction/serve mosaics)."""

    def test_tile_compress_jpeg_img_deflate_mask(self, scene):
        from unet_tpu.__main__ import cli
        from unet_tpu.geo import tiff

        root, ip, mp = scene
        rc = cli(["tile", str(ip), "--mask", str(mp),
                  "--base-dir", str(root / "cj"), "--patch-size", "50",
                  "--split", "0.8", "0.2", "--max-empty", "1.0",
                  "--compress", "jpeg"])
        assert rc == 0
        img = next((root / "cj" / "trai" / "img_tiles").glob("*.tif"))
        msk = (root / "cj" / "trai" / "mask_tiles") / img.name
        assert int(tiff.read_info(str(img)).tags[259]) == 7  # JPEG
        assert int(tiff.read_info(str(msk)).tags[259]) == 8  # deflate
        data, _ = tiff.read(str(msk))  # labels exact
        assert set(np.unique(data)) <= {0, 1, 2}

    def test_tile_compress_lossless_roundtrip(self, scene):
        from unet_tpu.__main__ import cli
        from unet_tpu.geo import tiff, read_raster

        root, ip, mp = scene
        rc = cli(["tile", str(ip), "--base-dir", str(root / "cl"),
                  "--patch-size", "50", "--split", "1.0",
                  "--max-empty", "1.0", "--compress", "jpeg-lossless"])
        assert rc == 0
        tiles = sorted((root / "cl" / "img_tiles").glob("*.tif"))
        assert tiles
        scene_arr = read_raster(str(ip)).data
        t0, info = tiff.read(str(tiles[0]))
        assert int(info.tags[259]) == 7
        np.testing.assert_array_equal(t0, scene_arr[:, :50, :50])

    def test_compress_none_explicit(self, scene):
        from unet_tpu.__main__ import cli
        from unet_tpu.geo import tiff

        root, ip, mp = scene
        rc = cli(["tile", str(ip), "--base-dir", str(root / "cn"),
                  "--patch-size", "50", "--split", "1.0",
                  "--max-empty", "1.0", "--compress", "none"])
        assert rc == 0
        t = next((root / "cn" / "img_tiles").glob("*.tif"))
        assert int(tiff.read_info(str(t)).tags.get(259, 1)) == 1

    def test_parser_exposes_compress_everywhere(self):
        from unet_tpu.__main__ import build_parser

        p = build_parser()
        for argv in (["tile", "x", "--base-dir", "b", "--compress", "lzw"],
                     ["predict", "m", "t", "--compress", "deflate"],
                     ["serve", "m", "r", "o", "--compress", "jpeg"]):
            args = p.parse_args(argv)
            assert args.compress in ("lzw", "deflate", "jpeg")

    def test_jpeg_compress_rejected_before_compute(self, tmp_path):
        # float32/int8 output modes must fail fast, not after the mosaic
        from unet_tpu.predict.predict import _check_out_compress

        with pytest.raises(ValueError, match="regression"):
            _check_out_compress("jpeg", regression=True)
        with pytest.raises(ValueError, match="large_file"):
            _check_out_compress("jpeg-lossless", large_file=True)
        with pytest.raises(ValueError, match="all_classes"):
            _check_out_compress("jpeg", all_classes=True)
        _check_out_compress("jpeg")          # class map: fine
        _check_out_compress("deflate", regression=True)  # lossless: fine
