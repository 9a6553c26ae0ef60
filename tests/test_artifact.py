"""AOT serving artifacts (predict/artifact.py).

The reference deploys by unpickling a fastai Learner (predict.py:161) —
needs the whole training stack, executes arbitrary code. The artifact path
freezes the prediction program as StableHLO next to raw weights. These
tests pin: numerical agreement with the live Predictor (all output
variants), symbolic-batch execution, survival across topology version
bumps that invalidate bundles, the CLI surface, and the no-pickle load.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from unet_tpu.predict import (ArtifactPredictor, Predictor, export_artifact,
                              is_artifact, load_artifact)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    """Tiny trained tpu_opt bundle + an exported artifact next to it."""
    from unet_tpu.geo import tiff as tiff_codec
    from unet_tpu.train.loop import TrainerConfig, train_model

    base = tmp_path_factory.mktemp("artifact_bundle")
    rng = np.random.default_rng(0)
    for split in ("trai", "vali"):
        (base / split / "img_tiles").mkdir(parents=True)
        (base / split / "mask_tiles").mkdir(parents=True)
        for i in range(2):
            img = rng.integers(0, 255, (3, 64, 64)).astype(np.uint8)
            msk = rng.integers(0, 3, (64, 64)).astype(np.uint8)
            tiff_codec.write(str(base / split / "img_tiles" / f"t_{i}.tif"), img)
            tiff_codec.write(str(base / split / "mask_tiles" / f"t_{i}.tif"), msk)
    out = train_model(TrainerConfig(
        data_path=base, model_path=base / "m", description="art",
        batch_size=2, epochs=1, lr=1e-3, arch="xresnet18",
        codes=["a", "b", "c"], tpu_opt=True, seed=0))
    art = export_artifact(str(out), str(base / "art.uta"), platforms=["cpu"])
    return out, art


class TestExport:
    def test_is_artifact(self, bundle, tmp_path):
        out, art = bundle
        assert is_artifact(art)
        assert not is_artifact(out)  # bundle dir
        junk = tmp_path / "x.uta"
        junk.write_bytes(b"not a zip")
        assert not is_artifact(junk)
        # an unrelated npz is not an artifact either
        np.savez(tmp_path / "y.npz", a=np.zeros(3))
        assert not is_artifact(tmp_path / "y.npz")

    def test_header_contents(self, bundle):
        _, art = bundle
        with np.load(art, allow_pickle=False) as z:  # no-pickle load by design
            header = json.loads(bytes(z["__utaot__"]).decode())
        assert header["format"] == "utaot-v1"
        assert header["patch_size"] == 64
        assert header["n_out"] == 3
        assert header["number_of_bands"] == 3
        assert header["platforms"] == ["cpu"]

    def test_bad_format_raises(self, bundle, tmp_path):
        _, art = bundle
        with np.load(art, allow_pickle=False) as z:
            members = {k: z[k] for k in z.files}
        members["__utaot__"] = np.frombuffer(
            json.dumps({"format": "utaot-v999"}).encode(), dtype=np.uint8)
        bad = tmp_path / "bad.uta"
        with open(bad, "wb") as f:
            np.savez(f, **members)
        with pytest.raises(ValueError, match="unknown artifact format"):
            load_artifact(str(bad))


class TestAgreement:
    def test_matches_live_predictor(self, bundle):
        out, art = bundle
        live = Predictor(str(out), batch_size=2)
        frozen = load_artifact(str(art), batch_size=2)
        x = np.random.default_rng(1).integers(
            0, 255, (2, 64, 64, 3)).astype(np.uint8)
        p_live = live.predict_batch(x)
        p_art = frozen.predict_batch(x)
        assert p_art.shape == p_live.shape == (2, 64, 64, 3)
        # same math, frozen lowering: only fusion-boundary rounding differs
        np.testing.assert_allclose(p_art, p_live, atol=2e-2)
        agree = np.mean(np.argmax(p_art, -1) == np.argmax(p_live, -1))
        assert agree > 0.99, f"class agreement {agree}"

    def test_variant_outputs(self, bundle):
        out, art = bundle
        live = Predictor(str(out), batch_size=2)
        frozen = load_artifact(str(art), batch_size=2)
        x = np.random.default_rng(2).integers(
            0, 255, (2, 64, 64, 3)).astype(np.uint8)
        folded = np.asarray(frozen.predict_batch_device(x, folded=True))
        assert folded.shape == (2, 64, 64 * 3)
        q = np.asarray(frozen.predict_batch_device(x, quantize_int8=True))
        assert q.dtype == np.int8
        q_live = np.asarray(live.predict_batch_device(x, quantize_int8=True))
        # int8 stretch quantizes to 32 levels; allow the ±1 off-by-rounding
        assert np.mean(np.abs(q.astype(int) - q_live.astype(int)) <= 1) > 0.999

    def test_symbolic_batch(self, bundle):
        _, art = bundle
        frozen = load_artifact(str(art))
        for b in (1, 5):
            x = np.zeros((b, 64, 64, 3), np.uint8)
            assert frozen.predict_batch(x).shape == (b, 64, 64, 3)

    def test_predict_raster_with_artifact(self, bundle, tmp_path):
        from unet_tpu.geo import tiff as tiff_codec
        from unet_tpu.predict.predict import predict_raster

        out, art = bundle
        scene = np.random.default_rng(3).integers(
            0, 255, (3, 128, 128)).astype(np.uint8)
        sp = str(tmp_path / "scene.tif")
        tiff_codec.write(sp, scene, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
        arr_live, _, _ = predict_raster(
            str(out), sp, None, patch_size=64, batch_size=2)
        arr_art, _, _ = predict_raster(
            str(out), sp, None, patch_size=64, batch_size=2,
            predictor=load_artifact(str(art), batch_size=2))
        agree = float(np.mean(np.asarray(arr_live) == np.asarray(arr_art)))
        assert agree > 0.99, f"mosaic agreement {agree}"


class TestTopologyIndependence:
    def test_artifact_survives_topology_bump(self, bundle, monkeypatch):
        """The exact failure artifacts exist to avoid: a tpu_opt_topology
        version bump makes load_bundle refuse the old bundle
        (checkpoint.py), but the frozen program keeps serving."""
        from unet_tpu.models import unet as unet_mod
        from unet_tpu.train.checkpoint import load_bundle

        out, art = bundle
        monkeypatch.setattr(unet_mod, "TPU_OPT_TOPOLOGY_VERSION", 999)
        with pytest.raises(ValueError, match="topology"):
            load_bundle(str(out))
        frozen = load_artifact(str(art))
        p = frozen.predict_batch(np.zeros((1, 64, 64, 3), np.uint8))
        assert p.shape == (1, 64, 64, 3)
        assert np.all(np.isfinite(p))


class TestCLI:
    def test_export_and_serve_cli(self, bundle, tmp_path, capsys):
        from unet_tpu.__main__ import cli
        from unet_tpu.geo import tiff as tiff_codec

        out, _ = bundle
        art = tmp_path / "cli.uta"
        assert cli(["export", str(out), str(art), "--platforms", "cpu"]) == 0
        assert is_artifact(art)
        scene = np.random.default_rng(4).integers(
            0, 255, (3, 64, 64)).astype(np.uint8)
        sp = str(tmp_path / "s.tif")
        tiff_codec.write(sp, scene, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
        served = str(tmp_path / "served.tif")
        assert cli(["serve", str(art), sp, served,
                    "--patch-size", "64", "--batch-size", "2"]) == 0
        arr, _ = tiff_codec.read(served)
        assert arr.dtype == np.uint8 and arr.shape == (1, 64, 64)

    def test_spatial_with_artifact_rejected(self, bundle, tmp_path):
        from unet_tpu.__main__ import cli
        from unet_tpu.geo import tiff as tiff_codec

        _, art = bundle
        scene = np.zeros((3, 64, 64), np.uint8)
        sp = str(tmp_path / "s.tif")
        tiff_codec.write(sp, scene, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
        with pytest.raises(SystemExit, match="live model bundle"):
            cli(["serve", str(art), sp, str(tmp_path / "o.tif"),
                 "--patch-size", "64", "--spatial", "2"])


class TestTTA:
    """4-fold dihedral test-time augmentation (predict.py::tta_probs_fn)."""

    def test_tta_equals_manual_flip_average(self, bundle):
        out, _ = bundle
        plain = Predictor(str(out), batch_size=2)
        tta = Predictor(str(out), batch_size=2, tta=True)
        x = np.random.default_rng(5).integers(
            0, 255, (2, 64, 64, 3)).astype(np.uint8)
        parts = [np.asarray(plain.predict_batch(x))]
        for ax in ((2,), (1,), (1, 2)):
            fx = np.flip(x, ax)
            parts.append(np.flip(np.asarray(plain.predict_batch(fx)), ax))
        manual = np.mean(parts, axis=0)
        got = np.asarray(tta.predict_batch(x))
        np.testing.assert_allclose(got, manual, atol=2e-2)
        # probabilities still normalized per pixel
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-2)

    def test_tta_on_artifact(self, bundle):
        out, art = bundle
        live = Predictor(str(out), batch_size=2, tta=True)
        frozen = load_artifact(str(art), batch_size=2, tta=True)
        x = np.random.default_rng(6).integers(
            0, 255, (2, 64, 64, 3)).astype(np.uint8)
        np.testing.assert_allclose(frozen.predict_batch(x),
                                   live.predict_batch(x), atol=2e-2)

    def test_cli_flag(self, bundle, tmp_path):
        from unet_tpu.__main__ import build_parser, cli
        from unet_tpu.geo import tiff as tiff_codec

        args = build_parser().parse_args(["serve", "m", "s.tif", "o.tif", "--tta"])
        assert args.tta
        out, _ = bundle
        scene = np.random.default_rng(7).integers(
            0, 255, (3, 64, 64)).astype(np.uint8)
        sp = str(tmp_path / "s.tif")
        tiff_codec.write(sp, scene, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
        served = str(tmp_path / "tta.tif")
        assert cli(["serve", str(out), sp, served,
                    "--patch-size", "64", "--batch-size", "2", "--tta"]) == 0
        arr, _ = tiff_codec.read(served)
        assert arr.dtype == np.uint8 and arr.shape == (1, 64, 64)


class TestQuantized:
    """int8 weight-quantized artifacts (export_artifact(quantize='int8'))."""

    @pytest.fixture(scope="class")
    def quant_art(self, bundle, tmp_path_factory):
        out, _ = bundle
        p = tmp_path_factory.mktemp("quant") / "q.uta"
        return export_artifact(str(out), str(p), platforms=["cpu"],
                               quantize="int8")

    def test_size_shrinks_4x(self, bundle, quant_art):
        _, art = bundle
        ratio = Path(quant_art).stat().st_size / Path(art).stat().st_size
        assert ratio < 0.35, f"quantized/f32 size ratio {ratio:.2f}"
        with np.load(quant_art, allow_pickle=False) as z:
            header = json.loads(bytes(z["__utaot__"]).decode())
            assert header["quantize"] == "int8"
            dtypes = {str(z[f"w{i:05d}"].dtype)
                      for i in range(header["n_leaves"])}
        assert "int8" in dtypes and "float32" in dtypes  # kernels q, BN f32

    def test_quality_vs_live(self, bundle, quant_art):
        out, _ = bundle
        live = Predictor(str(out), batch_size=2)
        q = load_artifact(str(quant_art), batch_size=2)
        x = np.random.default_rng(8).integers(
            0, 255, (4, 64, 64, 3)).astype(np.uint8)
        p_live = live.predict_batch(x)
        p_q = q.predict_batch(x)
        agree = np.mean(np.argmax(p_q, -1) == np.argmax(p_live, -1))
        assert agree > 0.97, f"quantized class agreement {agree}"
        # this 1-epoch model's softmax saturates, so near-tie pixels flip
        # hard — bound the MEAN probability drift, not the max
        assert float(np.mean(np.abs(p_q - p_live))) < 0.02

    def test_bad_mode_raises(self, bundle, tmp_path):
        out, _ = bundle
        with pytest.raises(ValueError, match="quantize"):
            export_artifact(str(out), str(tmp_path / "x.uta"),
                            platforms=["cpu"], quantize="int4")
