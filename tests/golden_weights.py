"""Golden pretrained-weight fixture (fastai xresnet34 layout).

Real fastai ImageNet weights cannot enter this environment (zero network
egress, fastai not installed — PARITY.md §Pretrained records the offline
recipe: ``torch.save(xresnet34(pretrained=True).state_dict(), ...)`` on a
networked machine, then ``python -m unet_tpu import-weights``). What CAN be
pinned here is everything downstream of that file: this module generates a
deterministic state_dict with fastai's EXACT module structure and key
layout for the reference's default architecture (xresnet34,
/root/reference/params_and_main.py:99; ``create_body`` usage at
train.py:128), using numpy-seeded values so the artifact is bit-stable
across torch versions. ``tests/golden_xresnet34_checksums.json`` (committed)
pins the converted archive's content hash and anchor-tensor statistics —
any converter drift fails loudly.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np
import torch
import torch.nn as tnn

GOLDEN_SEED = 20260817
CHECKSUM_FILE = Path(__file__).parent / "golden_xresnet34_checksums.json"


def conv_layer(ni, nf, ks=3, stride=1, act=True, zero_bn=False):
    conv = tnn.Conv2d(ni, nf, ks, stride, (ks - 1) // 2, bias=False)
    bn = tnn.BatchNorm2d(nf, eps=1e-5)
    tnn.init.constant_(bn.weight, 0.0 if zero_bn else 1.0)
    layers = [conv, bn] + ([tnn.ReLU()] if act else [])
    return tnn.Sequential(*layers)


class TorchResBlock(tnn.Module):
    """fastai ResBlock (expansion 1): convpath/idpath/act naming."""

    def __init__(self, ni, nf, stride=1):
        super().__init__()
        self.convpath = tnn.Sequential(
            conv_layer(ni, nf, 3, stride),
            conv_layer(nf, nf, 3, act=False, zero_bn=True),
        )
        idlayers = []
        if stride != 1:
            idlayers.append(tnn.AvgPool2d(2, ceil_mode=True))
        if ni != nf:
            idlayers.append(conv_layer(ni, nf, 1, act=False))
        self.idpath = tnn.Sequential(*idlayers)
        self.act = tnn.ReLU()

    def forward(self, x):
        return self.act(self.convpath(x) + self.idpath(x))


def torch_xresnet_body(arch: str = "xresnet34", c_in: int = 3) -> tnn.Sequential:
    """fastai ``create_body(xresnetNN)`` equivalent for expansion-1 nets:
    Sequential(stem0..2, maxpool, stage0..3) with fastai's key layout."""
    layers = {"xresnet18": (2, 2, 2, 2), "xresnet34": (3, 4, 6, 3)}[arch]
    stem = [conv_layer(c_in, 32, stride=2), conv_layer(32, 32), conv_layer(32, 64)]
    widths = [64, 128, 256, 512]
    stages = []
    ni = 64
    for s, n in enumerate(layers):
        nf = widths[s]
        blocks = [
            TorchResBlock(ni if b == 0 else nf, nf,
                          stride=1 if (s == 0 or b > 0) else 2)
            for b in range(n)
        ]
        stages.append(tnn.Sequential(*blocks))
        ni = nf
    return tnn.Sequential(*stem, tnn.MaxPool2d(3, 2, 1), *stages)


def golden_state_dict(arch: str = "xresnet34") -> dict:
    """Deterministic weights in fastai's key layout. Values come from a
    seeded NUMPY generator (torch RNG streams are not pinned across
    versions), filled in sorted-key order so the artifact is reproducible
    bit-for-bit anywhere."""
    body = torch_xresnet_body(arch)
    sd = body.state_dict()
    rng = np.random.default_rng(GOLDEN_SEED)
    out = {}
    for k in sorted(sd.keys()):
        t = sd[k]
        shape = tuple(t.shape)
        if k.endswith("num_batches_tracked"):
            out[k] = torch.tensor(1000, dtype=t.dtype)
        elif k.endswith("running_var"):
            out[k] = torch.from_numpy(
                (0.5 + rng.random(shape)).astype(np.float32))
        elif k.endswith("running_mean"):
            out[k] = torch.from_numpy(
                (rng.standard_normal(shape) * 0.2).astype(np.float32))
        elif ".1.weight" in k:  # BN scale: near the fastai init, perturbed
            out[k] = torch.from_numpy(
                (1.0 + rng.standard_normal(shape) * 0.1).astype(np.float32))
        elif ".1.bias" in k:
            out[k] = torch.from_numpy(
                (rng.standard_normal(shape) * 0.1).astype(np.float32))
        else:  # conv kernels: He-ish scale
            fan_in = int(np.prod(shape[1:]))
            out[k] = torch.from_numpy(
                (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in))
                .astype(np.float32))
    return out


def golden_body(arch: str = "xresnet34") -> tnn.Sequential:
    body = torch_xresnet_body(arch)
    body.load_state_dict(golden_state_dict(arch))
    body.eval()
    return body


def tree_sha256(tree) -> str:
    h = hashlib.sha256()

    def walk(t):
        for k in sorted(t):
            v = t[k]
            h.update(k.encode())
            if isinstance(v, dict):
                walk(v)
            else:
                h.update(np.ascontiguousarray(v).tobytes())

    walk(tree)
    return h.hexdigest()


def write_checksums(path: Path = CHECKSUM_FILE) -> dict:
    """Regenerate the committed checksum file (run on converter changes)."""
    from unet_tpu.models.torch_import import convert_xresnet_state_dict

    sd = {k: v.numpy() for k, v in golden_state_dict().items()}
    params, stats = convert_xresnet_state_dict(sd, "xresnet34")
    anchors = {}
    for name in ("stem_0", "stem_2", "stage_0_block_0", "stage_3_block_2"):
        k = params[name]
        kern = (k["conv"]["kernel"] if "conv" in k
                else k["conv1"]["conv"]["kernel"])
        anchors[name] = {
            "shape": list(np.shape(kern)),
            "mean": float(np.mean(kern)),
            "std": float(np.std(kern)),
        }
    data = {
        "arch": "xresnet34",
        "seed": GOLDEN_SEED,
        "params_sha256": tree_sha256(params),
        "stats_sha256": tree_sha256(stats),
        "n_params": int(sum(v.size for v in _leaves(params))),
        "anchors": anchors,
    }
    path.write_text(json.dumps(data, indent=1) + "\n")
    return data


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    print(json.dumps(write_checksums(), indent=1))
