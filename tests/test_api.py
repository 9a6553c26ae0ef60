import dataclasses
import json

import numpy as np
import pytest

from unet_tpu.api import Params, apply_extra_parameter_gate, params_from_json, trainer_config
from unet_tpu.utils.multirun import broadcast, check_and_fill


class TestExtraParameterGate:
    def test_gate_resets_extras(self):
        p = Params(enable_extra_parameters=False, self_attention=True,
                   ENCODER_FACTOR=99, LR_FINDER="valley", large_file=True,
                   max_empty=0.1, ARCHITECTURE="xresnet50", enable_regression=True)
        g = apply_extra_parameter_gate(p)
        assert g.self_attention is False
        assert g.ENCODER_FACTOR == 10.0
        assert g.LR_FINDER is None
        assert g.large_file is False
        assert g.max_empty == 0.9  # params_and_main.py:143 reset value
        assert g.ARCHITECTURE == "xresnet34"
        assert g.enable_regression is False

    def test_gate_warns_when_enabled(self):
        p = Params(enable_extra_parameters=True, ARCHITECTURE="xresnet50")
        with pytest.warns(UserWarning, match="Extra parameters are enabled"):
            g = apply_extra_parameter_gate(p)
        assert g.ARCHITECTURE == "xresnet50"  # kept

    def test_basic_params_never_reset(self):
        p = Params(enable_extra_parameters=False, BATCH_SIZE=7, EPOCHS=3,
                   LEARNING_RATE=0.5, CODES=["a", "b"])
        g = apply_extra_parameter_gate(p)
        assert g.BATCH_SIZE == 7 and g.EPOCHS == 3 and g.LEARNING_RATE == 0.5
        assert list(g.CODES) == ["a", "b"]


class TestTrainerConfigMapping:
    def test_field_mapping(self):
        p = Params(data_path="/d", model_path="/m", description="x",
                   BATCH_SIZE=6, EPOCHS=2, LEARNING_RATE=1e-3,
                   ARCHITECTURE="xresnet18", CODES=["a", "b", "c"],
                   CLASS_WEIGHTS=[1, 2, 3], ENCODER_FACTOR=5,
                   VALID_SCENES=["v1", "v2"], n_transform_imgs=0.5)
        c = trainer_config(p)
        assert c.batch_size == 6 and c.epochs == 2 and c.lr == 1e-3
        assert c.arch == "xresnet18" and c.codes == ["a", "b", "c"]
        assert c.class_weights == [1, 2, 3] and c.encoder_factor == 5
        assert c.valid_scenes == ["v1", "v2"] and c.n_transform_imgs == 0.5


class TestCheckAndFill:
    def test_broadcast_single(self):
        out = check_and_fill([[1], [2, 3]], 2)
        assert out == [[1, 1], [2, 3]]

    def test_mismatch_raises(self):
        with pytest.raises(ValueError, match="expected 3"):
            check_and_fill([[1, 2]], 3)

    def test_broadcast_scalar(self):
        assert broadcast("x", 3) == ["x", "x", "x"]
        assert broadcast([4], 2) == [4, 4]
        assert broadcast([1, 2], 2) == [1, 2]


class TestJsonConfig:
    def test_roundtrip(self, tmp_path):
        cfg = {"Train": True, "data_path": "/d", "model_path": "/m",
               "CODES": ["a", "b"], "BATCH_SIZE": 2,
               "aug_pipe": {"hflip_p": 0.7, "vflip_p": 0.0}}
        f = tmp_path / "p.json"
        f.write_text(json.dumps(cfg))
        p = params_from_json(f)
        assert p.Train is True and p.BATCH_SIZE == 2
        assert p.aug_pipe.hflip_p == 0.7

    def test_unknown_key_raises(self, tmp_path):
        f = tmp_path / "p.json"
        f.write_text(json.dumps({"nonsense_key": 1}))
        with pytest.raises(ValueError, match="Unknown parameters"):
            params_from_json(f)


class TestPlots:
    def test_visualize_data(self, tmp_path, rng):
        from unet_tpu.utils.plots import visualize_data

        imgs = rng.integers(0, 255, size=(4, 16, 16, 3)).astype(np.float32)
        out = visualize_data(imgs, tmp_path / "model.pkl")
        assert out.exists() and out.name.endswith("_image_plot.png")
        msks = rng.integers(0, 3, size=(4, 16, 16)).astype(np.float32)
        out = visualize_data(msks, tmp_path / "model.pkl")
        assert out.exists() and out.name.endswith("_mask_plot.png")

    def test_training_overview(self, tmp_path):
        from unet_tpu.utils.plots import plot_training_overview

        hist = [{"train_loss": 1.0 - 0.1 * i, "valid_loss": 0.9 - 0.1 * i} for i in range(5)]
        out = plot_training_overview(hist, "dice_multi", tmp_path / "h.png")
        assert out.exists()


class TestCompileCache:
    """Persistent XLA compilation cache wiring (utils/compile_cache.py)."""

    def _reset(self, monkeypatch):
        from unet_tpu.utils import compile_cache

        monkeypatch.setattr(compile_cache, "_ENABLED", None)
        return compile_cache

    def test_env_dir_selected(self, tmp_path, monkeypatch):
        cc = self._reset(monkeypatch)
        monkeypatch.setenv("UNET_TPU_COMPILE_CACHE", str(tmp_path / "c"))
        assert cc.enable_compile_cache() == str(tmp_path / "c")
        assert (tmp_path / "c").is_dir()
        # idempotent: later calls (and env changes) don't reconfigure
        monkeypatch.setenv("UNET_TPU_COMPILE_CACHE", "off")
        assert cc.enable_compile_cache() == str(tmp_path / "c")

    def test_off_switch(self, monkeypatch):
        cc = self._reset(monkeypatch)
        monkeypatch.setenv("UNET_TPU_COMPILE_CACHE", "off")
        assert cc.enable_compile_cache() is None
        assert cc.enable_compile_cache() is None  # stays off

    def test_explicit_dir_argument(self, tmp_path, monkeypatch):
        cc = self._reset(monkeypatch)
        monkeypatch.delenv("UNET_TPU_COMPILE_CACHE", raising=False)
        assert cc.enable_compile_cache(str(tmp_path / "d")) == str(tmp_path / "d")

    def test_cpu_default_skips(self, monkeypatch):
        """Default-on is scoped to accelerator platforms: CPU-only runs
        (this suite) skip the cache unless a dir is given explicitly —
        XLA:CPU AOT entries reload with machine-feature mismatch risk."""
        cc = self._reset(monkeypatch)
        monkeypatch.delenv("UNET_TPU_COMPILE_CACHE", raising=False)
        assert cc.enable_compile_cache() is None
