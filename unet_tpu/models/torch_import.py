"""Import pretrained torch/fastai xresnet encoder weights.

The reference's ``pretrained=True`` path loads fastai's ImageNet xresnet
weights (train.py:128). This environment has no fastai and no network, so
pretraining is delivered as a converter: given a torch ``state_dict`` for a
fastai ``xresnet{18,34,50,101}`` (saved with ``torch.save``), remap it onto
our Flax encoder parameter tree.

Layout mapping (fastai XResNet sequential → XResNetBody):
  0..2            stem ConvLayers      → stem_0..stem_2
  4+s (stage s)   blocks               → stage_{s}_block_{b}
    convpath convs  → conv1/conv2[/conv3]
    idconv          → idconv
Torch conv kernels are OIHW → transposed to flax HWIO; BatchNorm
weight/bias/running_mean/running_var map to scale/bias/mean/var.

Note the reference's multispectral stem swap DISCARDS the pretrained first
conv when ``n_input_channels != 3`` (train.py:130-135); ``load_encoder``
reproduces that: the stem_0 conv keeps its fresh init unless channel counts
match.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .xresnet import ARCHS


def _conv(w) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _bn(prefix: str, sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_xresnet_state_dict(
    sd: Dict[str, Any], arch: str = "xresnet34"
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch xresnet state_dict → (params, batch_stats) for XResNetBody.

    Accepts both bare tensors and anything numpy can view (call
    ``{k: v.numpy() for k, v in sd.items()}`` first for torch tensors).
    """
    expansion, layers = ARCHS[arch]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for i in range(3):  # stem ConvLayers at sequential indices 0..2
        p, s = _bn(f"{i}.1", sd)
        params[f"stem_{i}"] = {"conv": {"kernel": _conv(sd[f"{i}.0.weight"])}, "bn": p}
        stats[f"stem_{i}"] = {"bn": s}

    n_convs = 2 if expansion == 1 else 3
    for s_idx, n_blocks in enumerate(layers):
        seq = 4 + s_idx  # index in the torch Sequential (3 is the maxpool)
        for b in range(n_blocks):
            name = f"stage_{s_idx}_block_{b}"
            block: Dict[str, Any] = {}
            bstat: Dict[str, Any] = {}
            for c in range(n_convs):
                base = f"{seq}.{b}.convpath.{c}"
                p, st = _bn(f"{base}.1", sd)
                block[f"conv{c + 1}"] = {"conv": {"kernel": _conv(sd[f"{base}.0.weight"])}, "bn": p}
                bstat[f"conv{c + 1}"] = {"bn": st}
            # identity path: fastai idpath = [AvgPool?][ConvLayer]; the conv
            # (when present) is the last module with weights
            for id_idx in (0, 1):
                key = f"{seq}.{b}.idpath.{id_idx}.0.weight"
                if key in sd:
                    p, st = _bn(f"{seq}.{b}.idpath.{id_idx}.1", sd)
                    block["idconv"] = {"conv": {"kernel": _conv(sd[key])}, "bn": p}
                    bstat["idconv"] = {"bn": st}
            params[name] = block
            stats[name] = bstat
    return params, stats


def load_encoder(
    variables: Dict[str, Any],
    sd: Dict[str, Any],
    arch: str = "xresnet34",
) -> Dict[str, Any]:
    """Graft converted torch weights into a full DynamicUnet variables tree.

    Shapes must match except the first stem conv, which keeps its fresh
    init when the input channel count differs (the reference's
    multispectral swap semantics, train.py:130-135).
    """
    import jax

    enc_params, enc_stats = convert_xresnet_state_dict(sd, arch)
    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    return _graft_encoder(new_vars, enc_params, enc_stats)


def _graft_encoder(new_vars: Dict[str, Any], enc_params: Dict[str, Any],
                   enc_stats: Dict[str, Any]) -> Dict[str, Any]:
    tgt_p = new_vars["params"]["encoder"]
    tgt_s = new_vars["batch_stats"]["encoder"]
    skipped = []
    for name, block in enc_params.items():
        # Stem layers may legitimately mismatch and keep their fresh init:
        # stem_0 on input-channel count (the reference's multispectral swap,
        # train.py:130-135), and the whole stem when the target uses the
        # tpu_opt FOLDED stem (128/128/256-wide k4-s4 — a different
        # parameter shape by design; pretrained residual stages still
        # graft). Everything else grafts strictly.
        lenient = name.startswith("stem_")
        n_skip = _graft(tgt_p[name], block, allow_mismatch=lenient)
        n_skip += _graft(tgt_s[name], enc_stats[name], allow_mismatch=lenient)
        if n_skip:
            skipped.append(name)
    if skipped:
        print(f"pretrained: kept fresh init for mismatched stem layers "
              f"{skipped} (multispectral swap / tpu_opt folded stem); "
              "residual stages grafted")
    return new_vars


def _graft(target: Dict, source: Dict, allow_mismatch: bool) -> int:
    """Copy matching leaves; returns the number skipped (0 when strict)."""
    skipped = 0
    for k, v in source.items():
        if isinstance(v, dict):
            skipped += _graft(target[k], v, allow_mismatch)
        else:
            if np.shape(target[k]) != np.shape(v):
                if allow_mismatch:
                    skipped += 1
                    continue
                raise ValueError(
                    f"Shape mismatch for {k}: {np.shape(target[k])} vs {np.shape(v)}"
                )
            target[k] = np.asarray(v, dtype=np.asarray(target[k]).dtype)
    return skipped


# --- converted-archive format (.npz) -----------------------------------------
# ``python -m unet_tpu import-weights`` converts a torch state_dict once;
# training then consumes the .npz with no torch dependency. Offline
# acquisition of the real fastai ImageNet weights (train.py:128 equivalent),
# on any networked machine:
#     from fastai.vision.all import xresnet34; import torch
#     torch.save(xresnet34(pretrained=True).state_dict(), "xresnet34.pth")
# then ship xresnet34.pth here and run the import-weights command.


def _flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_converted(path: str, params: Dict[str, Any], stats: Dict[str, Any],
                   arch: str) -> None:
    """Write converted encoder weights as a torch-free .npz archive."""
    flat = {f"p/{k}": v for k, v in _flatten_tree(params).items()}
    flat.update({f"s/{k}": v for k, v in _flatten_tree(stats).items()})
    flat["__arch__"] = np.asarray(arch)
    np.savez(path, **flat)


def load_converted(path: str) -> Tuple[Dict[str, Any], Dict[str, Any], str]:
    """Read a converted .npz archive → (params, stats, arch)."""
    with np.load(path) as z:
        arch = str(z["__arch__"])
        p = {k[2:]: z[k] for k in z.files if k.startswith("p/")}
        s = {k[2:]: z[k] for k in z.files if k.startswith("s/")}
    return _unflatten_tree(p), _unflatten_tree(s), arch


def load_encoder_any(variables: Dict[str, Any], path: str,
                     arch: str = "xresnet34") -> Dict[str, Any]:
    """Graft pretrained encoder weights from either a torch state_dict
    (.pth/.pt, needs torch) or a converted .npz archive (torch-free)."""
    import jax

    if str(path).endswith(".npz"):
        enc_params, enc_stats, saved_arch = load_converted(path)
        if saved_arch != arch:
            raise ValueError(
                f"Converted weights are for {saved_arch}, model is {arch}")
        new_vars = jax.tree_util.tree_map(lambda x: x, variables)
        return _graft_encoder(new_vars, enc_params, enc_stats)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return load_encoder(variables, sd, arch)


def import_weights_cli(src: str, out: str, arch: str = "xresnet34") -> str:
    """``python -m unet_tpu import-weights`` backend: .pth → .npz."""
    import torch

    sd = torch.load(src, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    params, stats = convert_xresnet_state_dict(sd, arch)
    save_converted(out, params, stats, arch)
    n = sum(v.size for v in _flatten_tree(params).values())
    print(f"Converted {arch} encoder ({n/1e6:.1f}M params) -> {out}")
    return out
