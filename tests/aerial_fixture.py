"""Synthetic-but-realistic aerial scene generator for quality-parity tests.

Mimics the reference's production inputs (RGBI + nDSM orthophotos with
class-imbalanced vegetation/building/water masks — the LUP use case): the
class layout is generated from spatial structures (blobs/rectangles), the
bands carry correlated-but-noisy signatures of those structures, and the
mask is derived from the structures (never from a single band threshold),
so a model must combine bands and context to segment well.

Classes: 0=nodata-ish background edge, 1=ground, 2=trees, 3=buildings,
4=water — imbalanced roughly 8/55/20/12/5%.
"""

from __future__ import annotations

import numpy as np


def _smooth(a: np.ndarray, it: int = 12) -> np.ndarray:
    """Cheap separable box blur (no scipy dependency)."""
    for _ in range(it):
        a = (np.roll(a, 1, 0) + a + np.roll(a, -1, 0)) / 3.0
        a = (np.roll(a, 1, 1) + a + np.roll(a, -1, 1)) / 3.0
    return a


def make_scene(size: int = 512, seed: int = 0):
    """Returns (image (5,H,W) uint16, mask (H,W) uint8).

    Bands: R, G, B, NIR, nDSM — uint16 in a 0..4000 reflectance-ish range
    (dtype detection will call this 'int16' and scale by 1/255 like the
    reference does for 16-bit aerial data).
    """
    rng = np.random.default_rng(seed)
    H = W = size
    yy, xx = np.mgrid[0:H, 0:W]

    cls = np.ones((H, W), np.uint8)  # 1 = ground

    # trees: smoothed-noise blobs
    tree_field = _smooth(rng.normal(size=(H, W)), 15)
    cls[tree_field > np.quantile(tree_field, 0.80)] = 2

    # water: one meandering pond (two overlapping ellipses)
    for cy, cx, ry, rx in ((H * 0.7, W * 0.25, H * 0.12, W * 0.2),
                           (H * 0.78, W * 0.4, H * 0.08, W * 0.15)):
        el = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
        cls[el] = 4

    # buildings: axis-aligned rectangles, overriding everything
    n_build = max(6, size // 64)
    heights = np.zeros((H, W), np.float32)
    for _ in range(n_build):
        h = rng.integers(size // 16, size // 6)
        w = rng.integers(size // 16, size // 6)
        r0 = rng.integers(0, H - h)
        c0 = rng.integers(0, W - w)
        cls[r0 : r0 + h, c0 : c0 + w] = 3
        heights[r0 : r0 + h, c0 : c0 + w] = rng.uniform(6, 20)

    # nodata edge stripe (sensor boundary)
    stripe = size // 16
    cls[:, :stripe] = 0

    # --- bands with per-class signatures + correlated noise ------------------
    tex = _smooth(rng.normal(size=(H, W)), 4) * 0.6 + rng.normal(size=(H, W)) * 0.4

    base = {
        # cls: (R, G, B, NIR, ndsm_m)
        1: (900, 850, 700, 1600, 0.0),    # ground/grass
        2: (500, 700, 400, 2800, 8.0),    # trees: NIR-bright, tall-ish
        3: (1400, 1300, 1200, 1200, 0.0), # buildings: bright visible, NIR-dull
        4: (300, 400, 500, 150, 0.0),     # water: NIR-dark
        0: (0, 0, 0, 0, 0.0),
    }
    img = np.zeros((5, H, W), np.float32)
    for c, (r, g, b, nir, _h) in base.items():
        m = cls == c
        img[0][m], img[1][m], img[2][m], img[3][m] = r, g, b, nir
    # nDSM: building heights + tree canopy height variation
    ndsm = heights.copy()
    canopy = (cls == 2) * (6 + 4 * _smooth(rng.normal(size=(H, W)), 6))
    ndsm += canopy.astype(np.float32)
    # scale nDSM meters into the uint16 range like a typical product (cm)
    img[4] = ndsm * 100

    # multiplicative texture + additive sensor noise on reflectance bands
    img[:4] *= (1.0 + 0.25 * tex)
    img[:4] += rng.normal(scale=60, size=(4, H, W))
    img[4] += rng.normal(scale=20, size=(H, W))
    img = np.clip(img, 0, 4000)
    img[:, cls == 0] = 0  # nodata pixels zero across all bands

    return img.astype(np.uint16), cls


def class_iou(pred: np.ndarray, truth: np.ndarray, n_classes: int):
    """Per-class IoU + mean over classes present in truth."""
    ious = {}
    for c in range(n_classes):
        t = truth == c
        p = pred == c
        inter = np.logical_and(t, p).sum()
        union = np.logical_or(t, p).sum()
        if t.sum() == 0:
            continue
        ious[c] = inter / max(union, 1)
    miou = float(np.mean(list(ious.values())))
    return ious, miou
