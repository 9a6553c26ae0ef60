"""Model bundles and training checkpoints.

The reference checkpoints by pickling the entire fastai Learner
(``learn.export(description.pkl)``, train.py:373; consumed by
``load_learner`` for transfer learning at train.py:225 and prediction at
predict.py:161) and by ``SaveModelCallback`` best-epoch weights
(train.py:209). Pickle executes arbitrary code on load; the TPU-native
replacement is a **model bundle** directory:

    <model_path>/<description>/
        <description>.json        run manifest (data stats + hyperparams +
                                  everything needed to rebuild the model)
        <description>.msgpack     final {params, batch_stats} (flax msgpack)
        best-model.msgpack        best-epoch weights (SaveModelCallback)
        <description>_history.csv per-epoch log (CSVLogger schema)

plus step-level orbax checkpoints for mid-training resume — the elastic
upgrade the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import numpy as np
from flax import serialization

from ..models import build_unet


def save_weights(path: Union[str, Path], variables: Dict[str, Any]) -> None:
    """Serialize {'params': ..., 'batch_stats': ...} to flax msgpack."""
    host = jax.tree_util.tree_map(np.asarray, variables)
    Path(path).write_bytes(serialization.to_bytes(host))


def load_weights(path: Union[str, Path], template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    data = Path(path).read_bytes()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def save_manifest(path: Union[str, Path], manifest: Dict[str, Any]) -> None:
    def conv(o):
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, (int, float, str, bool, type(None), list, dict)):
            return o
        return str(o)

    Path(path).write_text(json.dumps(manifest, indent=4, default=conv))


def load_manifest(path: Union[str, Path]) -> Dict[str, Any]:
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"JSON file not found: {p}")
    return json.loads(p.read_text())


def bundle_paths(bundle: Union[str, Path]) -> Tuple[Path, Path, Path]:
    """Resolve a bundle reference to (dir, manifest.json, weights.msgpack).

    Accepts the bundle dir, the manifest path, the weights path, or — for
    reference-surface compatibility — a ``<description>.pkl`` path
    (params_and_main.py:68 constructs model_path/description/description.pkl).
    """
    p = Path(bundle)
    if p.is_dir():
        desc = p.name
        return p, p / f"{desc}.json", p / f"{desc}.msgpack"
    stem = p.stem
    d = p.parent
    return d, d / f"{stem}.json", d / f"{stem}.msgpack"


def export_bundle(
    bundle_dir: Union[str, Path],
    description: str,
    variables: Dict[str, Any],
    manifest: Dict[str, Any],
) -> Path:
    d = Path(bundle_dir)
    d.mkdir(parents=True, exist_ok=True)
    save_manifest(d / f"{description}.json", manifest)
    save_weights(d / f"{description}.msgpack", variables)
    return d


def load_bundle(bundle: Union[str, Path], best: bool = False):
    """Rebuild (model, variables, manifest) from a bundle — the
    ``load_learner`` equivalent for prediction and transfer learning."""
    d, manifest_path, weights_path = bundle_paths(bundle)
    manifest = load_manifest(manifest_path)
    if manifest.get("tpu_opt"):
        from ..models.unet import TPU_OPT_TOPOLOGY_VERSION

        v = manifest.get("tpu_opt_topology", 1)
        if v != TPU_OPT_TOPOLOGY_VERSION:
            raise ValueError(
                f"Bundle {d} was trained with tpu_opt topology v{v}; this "
                f"build uses v{TPU_OPT_TOPOLOGY_VERSION} (parameter shapes "
                "differ). Retrain, or load with the matching framework "
                "version. (The parity topology — tpu_opt=False — is stable "
                "across versions.)")
    best_path = d / "best-model.msgpack"
    if best and best_path.exists():
        weights_path = best_path
    model = build_unet(
        arch=manifest["ARCHITECTURE"],
        n_out=int(manifest["n_out"]),
        c_in=int(manifest["number_of_bands"]),
        self_attention=bool(manifest.get("self_attention", False)),
        tpu_opt=bool(manifest.get("tpu_opt", False)),
    )
    x = np.zeros((1, int(manifest["patch_size"]), int(manifest["patch_size"]),
                  int(manifest["number_of_bands"])), np.float32)
    # eval_shape: structure-only init template (no compute, no compile)
    template = jax.eval_shape(lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0))
    variables = load_weights(weights_path, template)
    return model, variables, manifest
