"""ScanNet-benchmark submission format I/O (reference trainer/trainer.py:168-187
writer; benchmark/util_3d.py reader semantics).

On-disk layout, byte-compatible with the reference so its own evaluation
tooling can consume our predictions and vice versa:

  {base}/{scene}.txt             lines: "pred_mask/{scene}_{i}.txt <label> <score>"
  {base}/pred_mask/{scene}_{i}.txt   one 0/1 per point line
  {gt_path}/{scene}.txt          one id per point line, id = sem*1000+inst+1
"""

from __future__ import annotations

import os

import numpy as np


def export_predictions(base_path: str, scene: str, masks: np.ndarray,
                       classes: np.ndarray, scores: np.ndarray,
                       score_threshold: float = 0.0) -> None:
    """Write one scene's predictions in the reference's submission format.
    masks: (P, K) bool/uint8; classes/scores: (K,)."""
    pred_mask_path = os.path.join(base_path, "pred_mask")
    os.makedirs(pred_mask_path, exist_ok=True)
    with open(os.path.join(base_path, f"{scene}.txt"), "w") as fout:
        for i in range(masks.shape[1]):
            if scores[i] <= score_threshold and score_threshold > 0:
                continue
            np.savetxt(os.path.join(pred_mask_path, f"{scene}_{i}.txt"),
                       masks[:, i].astype(np.uint8), fmt="%d")
            fout.write(f"pred_mask/{scene}_{i}.txt {int(classes[i])} "
                       f"{float(scores[i])}\n")


def read_predictions(base_path: str, scene: str) -> dict:
    """Parse one scene's submission files (benchmark/util_3d.py
    read_instance_prediction_file semantics: relative mask path, int label,
    float confidence per line)."""
    masks, classes, scores = [], [], []
    txt = os.path.join(base_path, f"{scene}.txt")
    with open(txt) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 3:
                continue
            rel, label, conf = parts
            mask_file = os.path.join(base_path, rel)
            if not os.path.isfile(mask_file):
                raise FileNotFoundError(
                    f"prediction mask referenced but missing: {mask_file}")
            masks.append(np.loadtxt(mask_file, dtype=np.int64).astype(bool))
            classes.append(int(label))
            scores.append(float(conf))
    if not masks:
        return {"masks": np.zeros((0, 0), bool),
                "classes": np.zeros(0, np.int64),
                "scores": np.zeros(0, np.float64)}
    return {"masks": np.stack(masks, axis=1),
            "classes": np.asarray(classes, np.int64),
            "scores": np.asarray(scores, np.float64)}


def export_gt(gt_path: str, scene: str, gt_ids: np.ndarray) -> None:
    """Write per-point GT ids (sem*1000 + inst + 1, reference
    datasets/preprocessing/scannet_preprocessing.py:147-148)."""
    os.makedirs(gt_path, exist_ok=True)
    np.savetxt(os.path.join(gt_path, f"{scene}.txt"), gt_ids.astype(np.int64),
               fmt="%d")
