"""Class-weight computation.

Reference rules (train.py:335-341 + utils.py:106-117):
* ``"even"``   → ``np.ones(n)/n``
* ``"weighted"`` → inverse frequency, weight_c = total_px / count_c, counted
  over (up to) 1200 training mask tiles
* explicit list → used as-is
* regression → ``[1]``

Improvement over the reference (documented quirk, SURVEY.md C7): the
reference counts ONE giant device batch and produces a short weight vector
when a class is absent (crashing the loss); here counts are streamed over
tiles with ``bincount(minlength=n_classes)`` and absent classes get weight 0.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

import numpy as np

from ..geo import read_raster

MAX_WEIGHT_TILES = 1200  # utils.py:109


def compute_class_weights(data_path: Path, n_classes: int, max_tiles: int = MAX_WEIGHT_TILES,
                          reference_quirks: bool = False,
                          seed: int = 0) -> List[float]:
    mask_dir = Path(data_path) / "trai" / "mask_tiles"
    files = sorted(mask_dir.glob("*.tif"))
    if not files:
        raise FileNotFoundError(f"No mask tiles under {mask_dir}")
    if reference_quirks:
        # Replicate the reference sampler exactly (utils.py:106-117): fastai
        # builds a dataloader with bs=min(#tiles, 1200) and takes ONE
        # shuffled train batch; fastai's TfmdDL.shuffle_fn is the legacy
        # ``np.random.permutation`` (MT19937), so the sampled tile subset is
        # the first bs indices of that permutation over the training items.
        # Weights come from ``np.unique(batch, return_counts=True)`` —
        # classes absent from the sampled batch silently drop out,
        # misaligning the weight vector with codes (the reference bug this
        # quirks mode preserves bit-for-bit).
        sample = np.random.RandomState(seed).permutation(len(files))[:max_tiles]
        values = np.concatenate(
            [read_raster(files[i]).data.astype(np.int64).ravel() for i in sample])
        uniq, counts = np.unique(values, return_counts=True)
        total = counts.sum()
        return [float(total / c) for c in counts]
    files = files[:max_tiles]
    counts = np.zeros(n_classes, dtype=np.int64)
    for f in files:
        m = read_raster(f).data.astype(np.int64).ravel()
        counts += np.bincount(m, minlength=n_classes)[:n_classes]
    total = counts.sum()
    return [float(total / c) if c > 0 else 0.0 for c in counts]


def resolve_class_weights(
    spec: Union[str, Sequence[float], None],
    codes: Sequence[str],
    data_path: Optional[Path] = None,
    regression: bool = False,
    reference_quirks: bool = False,
) -> List[float]:
    """train.py:335-341 defaulting."""
    if regression:
        return [1.0]
    if isinstance(spec, str):
        if spec == "even":
            return (np.ones(len(codes)) / len(codes)).tolist()
        if spec == "weighted":
            if data_path is None:
                raise ValueError("'weighted' class weights need a data_path")
            return compute_class_weights(data_path, len(codes),
                                         reference_quirks=reference_quirks)
        raise ValueError(f"Unknown class-weight spec {spec!r} (use 'even', 'weighted', or a list)")
    if spec is None:
        return (np.ones(len(codes)) / len(codes)).tolist()
    weights = [float(w) for w in spec]
    if len(weights) != len(codes):
        raise ValueError(f"{len(weights)} class weights for {len(codes)} codes")
    return weights
