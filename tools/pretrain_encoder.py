"""Pretrain a full-scale fastai-layout xresnet encoder in torch (CPU).

The reference's ``pretrained=True`` (train.py:128 ``create_body(arch,
pretrained)``) downloads fastai's ImageNet xresnet weights. This
environment has zero network egress, so no ImageNet checkpoint can enter;
what this tool delivers instead is a REAL training run producing a real
torch ``state_dict`` in exactly the layout users would ship ImageNet
weights in — the artifact then flows through the standard product path:

    python tools/pretrain_encoder.py --arch xresnet34 -o xresnet34_pre.pth
    python -m unet_tpu import-weights xresnet34_pre.pth -o xresnet34_pre.npz
    python -m unet_tpu train <tiles> --pretrained-weights xresnet34_pre.npz ...

The pretext task is procedural "aerial texture/shape" classification:
patches of band-limited background noise with painted structures
(rectangles / ellipses / stripes, band-specific intensity contrast), the
label being the structure x contrast-band class. Training on it teaches
the encoder generic low-level aerial features — band-contrast detectors,
oriented edges, region boundaries — which is what transfers into the
segmentation fine-tune (the warm-start-beats-scratch gate in
tests/test_pretrained_real.py runs this end to end).

Pure torch + numpy; independent of the JAX side by design (the state_dict
must look exactly like an externally produced one).
"""

from __future__ import annotations

import argparse
import time
from typing import Tuple

import numpy as np
import torch
import torch.nn as tnn


# --- fastai-layout body (create_body(xresnetNN) equivalent) -----------------
# Mirrors fastai's XResNet module structure and therefore state_dict keys:
# Sequential(stem ConvLayer x3, MaxPool, stage Sequentials of ResBlocks with
# convpath/idpath). Key layout is pinned by tests/golden_xresnet34_checksums
# via the converter; reference usage at /root/reference/train.py:128.


def conv_layer(ni: int, nf: int, ks: int = 3, stride: int = 1,
               act: bool = True, zero_bn: bool = False) -> tnn.Sequential:
    conv = tnn.Conv2d(ni, nf, ks, stride, (ks - 1) // 2, bias=False)
    bn = tnn.BatchNorm2d(nf, eps=1e-5)
    tnn.init.constant_(bn.weight, 0.0 if zero_bn else 1.0)
    layers = [conv, bn] + ([tnn.ReLU()] if act else [])
    return tnn.Sequential(*layers)


class ResBlock(tnn.Module):
    """fastai ResBlock (expansion 1): convpath/idpath/act naming."""

    def __init__(self, ni: int, nf: int, stride: int = 1):
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


LAYERS = {"xresnet18": (2, 2, 2, 2), "xresnet34": (3, 4, 6, 3)}


def xresnet_body(arch: str = "xresnet34", c_in: int = 3) -> tnn.Sequential:
    layers = LAYERS[arch]
    stem = [conv_layer(c_in, 32, stride=2), conv_layer(32, 32),
            conv_layer(32, 64)]
    widths = [64, 128, 256, 512]
    stages, ni = [], 64
    for s, n in enumerate(layers):
        nf = widths[s]
        stages.append(tnn.Sequential(*[
            ResBlock(ni if b == 0 else nf, nf,
                     stride=1 if (s == 0 or b > 0) else 2)
            for b in range(n)]))
        ni = nf
    return tnn.Sequential(*stem, tnn.MaxPool2d(3, 2, 1), *stages)


# --- procedural pretext dataset ----------------------------------------------

N_SHAPES = 4   # rect, ellipse, h-stripes, v-stripes
N_BANDS = 3    # which band carries the contrast
N_CLASSES = N_SHAPES * N_BANDS


def make_batch(rng: np.random.Generator, batch: int, size: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """(batch, 3, size, size) float32 on the RAW 0-255 scale + int labels.

    Deliberately NOT normalized to [0,1]: the product pipeline feeds the
    encoder unscaled int8-range values, and pretraining on a different
    input scale shifts the stem/BN statistics and kills the warm start.
    """
    imgs = rng.integers(10, 60, (batch, 3, size, size)).astype(np.float32)
    labels = rng.integers(0, N_CLASSES, batch)
    yy, xx = np.mgrid[:size, :size]
    for i in range(batch):
        shape, band = divmod(int(labels[i]), N_BANDS)
        cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
        hh, ww = rng.integers(size // 8, size // 3, 2)
        if shape == 0:      # rectangle
            m = (np.abs(yy - cy) < hh) & (np.abs(xx - cx) < ww)
        elif shape == 1:    # ellipse
            m = ((yy - cy) / max(hh, 1)) ** 2 + ((xx - cx) / max(ww, 1)) ** 2 < 1
        elif shape == 2:    # horizontal stripes
            m = ((yy // max(int(hh) // 2, 2)) % 2 == 0) & (np.abs(xx - cx) < ww * 1.5)
        else:               # vertical stripes
            m = ((xx // max(int(ww) // 2, 2)) % 2 == 0) & (np.abs(yy - cy) < hh * 1.5)
        paint = rng.integers(90, 160, int(m.sum())).astype(np.float32)
        imgs[i, band][m] = paint
    # RAW 0-255 values, NOT /255: the product pipeline's reference-faithful
    # normalization feeds int8 rasters unscaled (data/augment.py
    # image_scale — the reference never rescales uint8), so the encoder
    # must be pretrained on the same input convention or its stem filters
    # and BN statistics arrive 255x off at fine-tune time
    return imgs, labels.astype(np.int64)


# --- training loop ------------------------------------------------------------


def pretrain(arch: str = "xresnet34", steps: int = 400, batch: int = 16,
             size: int = 64, lr: float = 1e-3, seed: int = 0,
             log_every: int = 25) -> tnn.Sequential:
    """Train body+linear head on the pretext task; returns the body."""
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    body = xresnet_body(arch)
    head = tnn.Sequential(tnn.AdaptiveAvgPool2d(1), tnn.Flatten(),
                          tnn.Linear(512, N_CLASSES))
    model = tnn.Sequential(body, head)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, total_steps=steps, pct_start=0.25)
    loss_fn = tnn.CrossEntropyLoss()
    t0 = time.monotonic()
    for step in range(steps):
        x, y = make_batch(rng, batch, size)
        logits = model(torch.from_numpy(x))
        loss = loss_fn(logits, torch.from_numpy(y))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if step % log_every == 0 or step == steps - 1:
            acc = (logits.detach().argmax(1).numpy() == y).mean()
            print(f"step {step:4d}  loss {float(loss):.4f}  "
                  f"batch-acc {acc:.2f}  {time.monotonic() - t0:.0f}s",
                  flush=True)
    return body


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--arch", default="xresnet34", choices=sorted(LAYERS))
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--out", default="xresnet_pretext.pth")
    args = ap.parse_args()
    body = pretrain(args.arch, args.steps, args.batch, args.size, args.lr,
                    args.seed)
    torch.save(body.state_dict(), args.out)
    n = sum(p.numel() for p in body.parameters())
    print(f"saved {args.arch} body ({n / 1e6:.1f}M params) -> {args.out}")


if __name__ == "__main__":
    main()
