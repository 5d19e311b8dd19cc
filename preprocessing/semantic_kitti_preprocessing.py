"""SemanticKITTI preprocessing (reference
datasets/preprocessing/semantic_kitti_preprocessing.py): velodyne .bin scans +
.label files -> Mask3D npy layout, sequence-based splits.

  python preprocessing/semantic_kitti_preprocessing.py \
      --data_dir data/SemanticKITTI/dataset/sequences --save_dir data/processed/kitti
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TRAIN_SEQ = ("00", "01", "02", "03", "04", "05", "06", "07", "09", "10")
VAL_SEQ = ("08",)


def process_scan(bin_path: Path, label_path: Path, out_dir: Path):
    pts = np.fromfile(bin_path, dtype=np.float32).reshape(-1, 4)
    if label_path.exists():
        raw = np.fromfile(label_path, dtype=np.uint32)
        sem = (raw & 0xFFFF).astype(np.int64)
        inst = (raw >> 16).astype(np.int64)
    else:
        sem = np.zeros(len(pts), np.int64)
        inst = np.full(len(pts), -1, np.int64)
    n = len(pts)
    remission = np.tile(pts[:, 3:4] * 255.0, (1, 3))
    cell = np.floor(pts[:, :3] / 1.0).astype(np.int64) + 4096
    _, segments = np.unique(
        cell[:, 0] * (1 << 26) + cell[:, 1] * (1 << 13) + cell[:, 2],
        return_inverse=True,
    )
    points = np.hstack([
        pts[:, :3], remission, np.zeros((n, 3)),
        segments[:, None], sem[:, None], inst[:, None],
    ]).astype(np.float32)
    out_dir.mkdir(parents=True, exist_ok=True)
    name = f"{bin_path.parents[1].name}_{bin_path.stem}"
    path = out_dir / f"{name}.npy"
    np.save(path, points)
    return {"filepath": str(path), "scene": name, "raw_filepath": str(bin_path)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--frame_skip", type=int, default=10)
    args = ap.parse_args()

    save_dir = Path(args.save_dir)
    databases = {"train": [], "validation": []}
    for seq_dir in sorted(Path(args.data_dir).iterdir()):
        seq = seq_dir.name
        mode = "train" if seq in TRAIN_SEQ else (
            "validation" if seq in VAL_SEQ else None)
        if mode is None:
            continue
        scans = sorted((seq_dir / "velodyne").glob("*.bin"))[:: args.frame_skip]
        for bin_path in scans:
            label_path = seq_dir / "labels" / (bin_path.stem + ".label")
            entry = process_scan(bin_path, label_path, save_dir / mode)
            databases[mode].append(entry)
        print(f"seq {seq}: {len(scans)} scans -> {mode}")
    for mode, db in databases.items():
        if db:
            with open(save_dir / f"{mode}_database.yaml", "w") as f:
                yaml.safe_dump(db, f)


if __name__ == "__main__":
    main()
