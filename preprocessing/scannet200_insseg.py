"""ScanNet -> scannet200_insseg preprocessing (reference
pseudo_masks/datasets/preprocess/scannet200_insseg.py:40-101).

For each scan: parse `_vh_clean_2.ply` + `.segs.json` + `.aggregation.json`,
map raw categories to ScanNet ids via scannetv2-labels.combined.tsv, and save
a `(points, colors, sem_labels, instance_ids)` tuple as `{scene}.pth`
(torch.save). Split txts are copied alongside.

  python preprocessing/scannet200_insseg.py --scans_dir data/ScanNet/scans \
      --label_tsv data/ScanNet/scannetv2-labels.combined.tsv \
      --output_dir data/ScanNet/scannet_200_insseg
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from unscene3d_tpu.data.ply import read_ply
from unscene3d_tpu.data.scannet_constants import VALID_CLASS_IDS_200, load_label_map


def process_scene(scene_dir: str, label_map: dict, output_dir: str):
    import torch

    scene = Path(scene_dir).name
    mesh = read_ply(os.path.join(scene_dir, f"{scene}_vh_clean_2.ply"))
    points = mesh["vertices"].astype(np.float32)
    colors = (mesh["colors"].astype(np.float32) / 127.5) - 1.0

    with open(os.path.join(scene_dir, f"{scene}_vh_clean_2.0.010000.segs.json")) as f:
        seg_indices = np.asarray(json.load(f)["segIndices"])
    with open(os.path.join(scene_dir, f"{scene}.aggregation.json")) as f:
        agg = json.load(f)["segGroups"]

    sem = np.full(len(points), -1, np.int64)
    inst = np.full(len(points), -1, np.int64)
    valid = set(VALID_CLASS_IDS_200)
    for group in agg:
        label_id = label_map.get(group["label"], -1)
        if label_id not in valid:
            label_id = -1
        mask = np.isin(seg_indices, group["segments"])
        sem[mask] = label_id
        inst[mask] = group["objectId"]

    torch.save((points, colors, sem, inst),
               os.path.join(output_dir, f"{scene}.pth"))
    return scene, int(inst.max()) + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans_dir", required=True)
    ap.add_argument("--label_tsv", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--splits_dir", default=None,
                    help="dir with scannetv2_{train,val,test}.txt to copy")
    args = ap.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    label_map = load_label_map(args.label_tsv, to="id")
    scenes = sorted(d for d in Path(args.scans_dir).iterdir() if d.is_dir())
    for i, scene_dir in enumerate(scenes):
        name, n_inst = process_scene(str(scene_dir), label_map, args.output_dir)
        print(f"[{i + 1}/{len(scenes)}] {name}: {n_inst} instances")

    if args.splits_dir:
        import shutil

        for split in ("train", "val", "test"):
            src = os.path.join(args.splits_dir, f"scannetv2_{split}.txt")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(args.output_dir, f"{split}.txt"))


if __name__ == "__main__":
    main()
