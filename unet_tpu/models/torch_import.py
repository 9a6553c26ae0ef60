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

from typing import Any, Dict, Optional, Tuple

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


# --- full-model import (fastai DynamicUnet state_dict) -----------------------
# The reference exports whole trained Learners (train.py:373 ``learn.export``)
# and its users hold those .pkl files. Unpickling one requires fastai; the
# torch-free migration path is one line on any machine that can load it:
#     learn = load_learner("model.pkl"); import torch
#     torch.save(learn.model.state_dict(), "model_sd.pth")
# then ``python -m unet_tpu import-model model_sd.pth <bundle>`` converts the
# FULL DynamicUnet (encoder + decoder + head) into a prediction-ready bundle.
# Layer indices below mirror fastai's DynamicUnet ModuleList (SequentialEx):
#   layers.0 encoder • 1 BatchNorm • 2 ReLU • 3 middle_conv(2x ConvLayer) •
#   4.. UnetBlocks • [PixelShuffle_ICNR] • ResizeToOrig • MergeLayer •
#   ResBlock(last_cross) • ConvLayer(head)
# with the reference's norm_type=NormType *class* quirk (unet_learner_MS,
# train.py:100/141-144): decoder ConvLayers carry conv BIAS and no norm.


def _infer_arch(enc_sd: Dict[str, Any]) -> str:
    """Recover the xresnet variant from encoder key structure."""
    stages = []
    expansion = 1
    s = 0
    while f"{4 + s}.0.convpath.0.0.weight" in enc_sd:
        b = 0
        while f"{4 + s}.{b}.convpath.0.0.weight" in enc_sd:
            b += 1
        if f"{4 + s}.0.convpath.2.0.weight" in enc_sd:
            expansion = 4
        stages.append(b)
        s += 1
    for name, (exp, layers) in ARCHS.items():
        if exp == expansion and tuple(layers) == tuple(stages):
            return name
    raise ValueError(
        f"Encoder structure (expansion {expansion}, stages {stages}) matches "
        f"no known architecture; options: {sorted(ARCHS)}")


def _bias_conv(g: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """A norm-broken decoder ConvLayer: conv with bias, keys {prefix}.0.*."""
    return {"conv": {"kernel": _conv(g[f"{prefix}.0.weight"]),
                     "bias": np.asarray(g[f"{prefix}.0.bias"])}}


def _bn_group(g: Dict[str, Any], prefix: str = "") -> Tuple[Dict, Dict]:
    p = prefix + "." if prefix else ""
    return ({"scale": np.asarray(g[f"{p}weight"]),
             "bias": np.asarray(g[f"{p}bias"])},
            {"mean": np.asarray(g[f"{p}running_mean"]),
             "var": np.asarray(g[f"{p}running_var"])})


def _sa_group(g: Dict[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    """fastai SelfAttention under ConvLayer xtra (keys {prefix}.{query,...}.0):
    spectral-normed 1-d convs store weight_orig (out,in,1) + power-iteration
    buffers; our SelfAttention keeps the transposed kernel (in,out) and the
    ``u`` vector in batch_stats (layers.py:422-489)."""
    params: Dict[str, Any] = {
        "gamma": np.asarray(g[f"{prefix}.gamma"]).reshape(1)}
    stats: Dict[str, Any] = {}
    for name in ("query", "key", "value"):
        w = np.asarray(g[f"{prefix}.{name}.0.weight_orig"])  # (out, in, 1)
        params[f"{name}_kernel"] = w[:, :, 0].T
        stats[f"{name}_u"] = np.asarray(g[f"{prefix}.{name}.0.weight_u"])
    return params, stats


def convert_unet_state_dict(
    sd: Dict[str, Any], arch: Optional[str] = None
) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """fastai DynamicUnet ``state_dict`` → (params, batch_stats, meta) for
    models.DynamicUnet (parity topology; tpu_opt reshapes parameters and is
    train-only). ``meta`` reports the inferred arch/c_in/n_out/self_attention.

    Accepts numpy-viewable values (for torch tensors, convert with
    ``{k: v.numpy() for k, v in sd.items()}`` first).
    """
    groups: Dict[int, Dict[str, Any]] = {}
    for k, v in sd.items():
        if not k.startswith("layers."):
            raise ValueError(
                "Not a DynamicUnet state_dict (expected 'layers.N...' keys; "
                "save it with torch.save(learn.model.state_dict(), path)). "
                f"First key: {next(iter(sd))!r}")
        _, idx, rest = k.split(".", 2)
        groups.setdefault(int(idx), {})[rest] = v

    enc_sd = groups.pop(0)
    if arch is None:
        arch = _infer_arch(enc_sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["encoder"], stats["encoder"] = convert_xresnet_state_dict(enc_sd, arch)

    blocks = 0
    self_attention = False
    for idx in sorted(groups):
        g = groups[idx]
        if "running_mean" in g:  # layers.1 — the middle BatchNorm
            params["mid_bn"], stats["mid_bn"] = _bn_group(g)
        elif "0.0.weight" in g and "1.0.weight" in g:  # middle_conv pair
            params["mid_conv1"] = _bias_conv(g, "0")
            params["mid_conv2"] = _bias_conv(g, "1")
        elif "shuf.0.0.weight" in g:  # a UnetBlock
            name = f"up_{blocks}"
            blocks += 1
            bn_p, bn_s = _bn_group(g, "bn")
            params[name] = {
                "shuf": {"conv": {"kernel": _conv(g["shuf.0.0.weight"]),
                                  "bias": np.asarray(g["shuf.0.0.bias"])}},
                "bn": bn_p,
                "conv1": _bias_conv(g, "conv1"),
                "conv2": _bias_conv(g, "conv2"),
            }
            stats[name] = {"bn": bn_s}
            if "conv2.2.gamma" in g:  # ConvLayer xtra = SelfAttention
                self_attention = True
                params[name]["sa"], stats[name]["sa"] = _sa_group(g, "conv2.2")
        elif "0.0.weight" in g:  # trailing PixelShuffle_ICNR
            params["final_shuf"] = {
                "conv": {"kernel": _conv(g["0.0.weight"]),
                         "bias": np.asarray(g["0.0.bias"])}}
        elif "convpath.0.0.weight" in g:  # last_cross ResBlock
            rb = {"conv1": _bias_conv(g, "convpath.0"),
                  "conv2": _bias_conv(g, "convpath.1")}
            for id_idx in (0, 1):
                if f"idpath.{id_idx}.0.weight" in g:
                    rb["idconv"] = _bias_conv(g, f"idpath.{id_idx}")
            params["last_cross"] = rb
        elif "0.weight" in g:  # head ConvLayer(ks=1, no act)
            params["head"] = {"kernel": _conv(g["0.weight"]),
                              "bias": np.asarray(g["0.bias"])}
        else:
            raise ValueError(f"Unrecognized DynamicUnet layer {idx}: "
                             f"{sorted(g)[:4]}")

    meta = {
        "arch": arch,
        "c_in": int(np.shape(enc_sd["0.0.weight"])[1]),
        "n_out": int(np.shape(params["head"]["kernel"])[-1]),
        "self_attention": self_attention,
        "n_blocks": blocks,
    }
    return params, stats, meta


def load_unet_state_dict(
    variables: Dict[str, Any], sd: Dict[str, Any], arch: Optional[str] = None
) -> Dict[str, Any]:
    """Graft a full fastai DynamicUnet state_dict into a DynamicUnet
    variables tree (strict: every shape must match — full-model import
    implies identical topology, so there is no multispectral leniency)."""
    import jax

    params, stats, _ = convert_unet_state_dict(sd, arch)
    new_vars = jax.tree_util.tree_map(lambda x: x, variables)
    src_flat = _flatten_tree(params)
    tgt_flat = _flatten_tree(new_vars["params"])
    missing = sorted(set(tgt_flat) - set(src_flat))
    extra = sorted(set(src_flat) - set(tgt_flat))
    if missing or extra:
        raise ValueError(
            "DynamicUnet parameter trees do not line up (is the target model "
            "built with tpu_opt or a different arch/self_attention?): "
            f"missing from state_dict: {missing[:6]}; "
            f"unexpected in state_dict: {extra[:6]}")
    _graft(new_vars["params"], params, allow_mismatch=False)
    _graft(new_vars["batch_stats"], stats, allow_mismatch=False)
    return new_vars


def import_model_cli(
    src: str,
    bundle_dir: str,
    description: Optional[str] = None,
    patch_size: int = 400,
    regression: bool = False,
    codes: Optional[list] = None,
    dtype_str: str = "int8",
) -> str:
    """``python -m unet_tpu import-model``: full fastai DynamicUnet
    state_dict (.pth) → prediction-ready model bundle.

    The bundle is the load_learner equivalent (train/checkpoint.py), so the
    imported model drives predict/serve/export exactly like one trained here.
    """
    import jax
    import torch

    from ..train.checkpoint import export_bundle
    from .unet import build_unet

    sd = torch.load(src, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    params, stats, meta = convert_unet_state_dict(sd)
    model = build_unet(arch=meta["arch"], n_out=meta["n_out"],
                       c_in=meta["c_in"],
                       self_attention=meta["self_attention"])
    # param/stat SHAPES don't depend on the input grid, so a tiny 64² init
    # is enough to build the graft template
    x = np.zeros((1, 64, 64, meta["c_in"]), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = load_unet_state_dict(variables, sd, meta["arch"])

    from pathlib import Path

    d = Path(bundle_dir)
    desc = description or d.name
    manifest = {
        "ARCHITECTURE": meta["arch"],
        "n_out": meta["n_out"],
        "c_in": meta["c_in"],
        "number_of_bands": meta["c_in"],
        "patch_size": patch_size,
        "self_attention": meta["self_attention"],
        "enable_regression": regression,
        "CODES": list(codes) if codes else None,
        "dtype_str": dtype_str,
        "normalize": "reference",
        "tpu_opt": False,
        "imported_from": str(src),
    }
    export_bundle(d, desc, variables, manifest)
    n = sum(v.size for v in _flatten_tree(variables["params"]).values())
    print(f"Imported {meta['arch']} DynamicUnet ({n/1e6:.1f}M params, "
          f"c_in={meta['c_in']}, n_out={meta['n_out']}, "
          f"self_attention={meta['self_attention']}) -> {d}")
    return str(d)


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
