"""S3DIS (Stanford) preprocessing (reference
datasets/preprocessing/s3dis_preprocessing.py).

Parses Area_*/room/Annotations/*.txt object files into the Mask3D npy layout
[xyz, rgb, normal(zeros), segment, label, instance] with per-room databases.

  python preprocessing/s3dis_preprocessing.py --data_dir Stanford3dDataset_v1.2 \
      --save_dir data/processed/s3dis
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

S3DIS_CLASSES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
)
CLASS_TO_ID = {c: i for i, c in enumerate(S3DIS_CLASSES)}


def process_room(room_dir: Path, save_dir: Path, mode: str):
    pts, labels, insts = [], [], []
    ann = room_dir / "Annotations"
    for inst_id, obj_file in enumerate(sorted(ann.glob("*.txt"))):
        cls = obj_file.stem.rsplit("_", 1)[0]
        label = CLASS_TO_ID.get(cls, CLASS_TO_ID["clutter"])
        data = np.loadtxt(obj_file)
        if data.ndim == 1:
            data = data[None]
        pts.append(data[:, :6])
        labels.append(np.full(len(data), label))
        insts.append(np.full(len(data), inst_id))
    if not pts:
        return None
    xyz_rgb = np.vstack(pts)
    labels = np.concatenate(labels)
    insts = np.concatenate(insts)
    n = len(xyz_rgb)
    # segments: coarse grid cells (S3DIS has no mesh for Felzenszwalb)
    cell = np.floor(xyz_rgb[:, :3] / 0.5).astype(np.int64)
    _, segments = np.unique(
        cell[:, 0] * 10**8 + cell[:, 1] * 10**4 + cell[:, 2], return_inverse=True
    )
    points = np.hstack([
        xyz_rgb[:, :3], xyz_rgb[:, 3:6], np.zeros((n, 3)),
        segments[:, None], labels[:, None], insts[:, None],
    ]).astype(np.float32)
    out_dir = save_dir / mode
    out_dir.mkdir(parents=True, exist_ok=True)
    name = f"{room_dir.parent.name}_{room_dir.name}"
    path = out_dir / f"{name}.npy"
    np.save(path, points)
    return {"filepath": str(path), "raw_filepath": str(room_dir), "scene": name,
            "color_mean": (xyz_rgb[:, 3:6] / 255.0).mean(0).tolist(),
            "color_std": ((xyz_rgb[:, 3:6] / 255.0) ** 2).mean(0).tolist()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--test_area", type=int, default=5)
    args = ap.parse_args()

    save_dir = Path(args.save_dir)
    databases = {"train": [], "validation": []}
    for area in sorted(Path(args.data_dir).glob("Area_*")):
        mode = "validation" if area.name.endswith(str(args.test_area)) else "train"
        for room in sorted(p for p in area.iterdir() if p.is_dir()):
            entry = process_room(room, save_dir, mode)
            if entry:
                databases[mode].append(entry)
                print(f"{entry['scene']} -> {mode}")
    for mode, db in databases.items():
        with open(save_dir / f"{mode}_database.yaml", "w") as f:
            yaml.safe_dump(db, f)


if __name__ == "__main__":
    main()
