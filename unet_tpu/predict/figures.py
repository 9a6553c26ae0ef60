"""Validation figures: tile-majority confusion matrix + classification report.

Port of predict.py:56-143 ``plot_valid_predict``: per-tile majority class
(``argmax(bincount(...))``) for prediction vs ground-truth mask, sklearn
confusion matrix + classification report rendered as seaborn heatmaps into
``<output>/Valid_figures/``. Refuses merge and regression modes like the
reference (predict.py:57-60).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from ..geo import read_raster  # noqa: E402


def plot_valid_predict(
    output_folder: str,
    predict_path: str,
    regression: bool = False,
    merge: bool = False,
    class_zero: bool = False,
) -> Tuple[np.ndarray, str]:
    if merge:
        raise ValueError("It's not possible to calculate the confusion matrix with merged tiles")
    if regression:
        raise ValueError("This function is just for classification problems")

    from sklearn.metrics import classification_report, confusion_matrix

    valid_path = Path(output_folder) / "Valid_figures"
    valid_path.mkdir(parents=True, exist_ok=True)
    truth_dir = Path(str(predict_path).replace("img_tiles", "mask_tiles"))

    y_true, y_pred = [], []
    for file_name in sorted(os.listdir(output_folder)):
        if not file_name.endswith(".tif"):
            continue
        pred_data = read_raster(Path(output_folder) / file_name).data[0].astype(np.int64)
        true_path = truth_dir / file_name
        if not true_path.exists():
            continue
        true_data = read_raster(true_path).data[0].astype(np.int64)
        pred_class = int(np.argmax(np.bincount(pred_data.ravel())))
        true_class = int(np.argmax(np.bincount(true_data.ravel())))
        if class_zero:
            # reference intent (predict.py:87-89): drop nodata-majority
            # tiles and shift classes back down
            if true_class == 0:
                continue
            true_class -= 1
        y_true.append(true_class)
        y_pred.append(pred_class)

    if not y_true:
        raise ValueError("No valid tiles found for evaluation")

    cm = confusion_matrix(y_true, y_pred)
    class_report = classification_report(y_true, y_pred, zero_division=1)
    report_dict = classification_report(y_true, y_pred, zero_division=1, output_dict=True)

    rows = []
    class_names = []
    for key, vals in report_dict.items():
        if not isinstance(vals, dict) or key in ("macro avg", "weighted avg"):
            continue
        class_names.append(key)
        rows.append({
            "class": key,
            "precision": vals["precision"],
            "recall": vals["recall"],
            "f1_score": vals["f1-score"],
            "support": int(vals["support"]),
        })
    df = pd.DataFrame(rows)

    try:
        import seaborn as sns

        plt.figure(figsize=(10, 7))
        sns.heatmap(df.set_index("class"), annot=True, fmt=".2f", cmap="crest")
        plt.title("Classification Report")
        plt.savefig(valid_path / "classification_report.png")
        plt.close()

        plt.figure(figsize=(10, 7))
        sns.heatmap(cm, annot=True, fmt="d", cmap="crest",
                    xticklabels=class_names, yticklabels=class_names)
        plt.xlabel("Predicted")
        plt.ylabel("True")
        plt.title("Confusion Matrix")
        plt.savefig(valid_path / "Confusion_Matrix.png")
        plt.close()
    except Exception as e:  # figures are best-effort; numbers always returned
        print(f"Figure rendering failed: {e}")

    print("Confusion Matrix:")
    print(cm)
    print("\nClassification Report:")
    print(class_report)
    return cm, class_report
