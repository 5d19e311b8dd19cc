"""Freemask dataset preprocessing (reference
datasets/preprocessing/freemask_preprocessing.py:14-241).

Builds the Mask3D-format training dataset from raw ScanNet scans plus
pseudo-mask outputs (or GT in --oracle mode):
  * scene npy: columns [xyz(3), rgb(3) 0-255, normal(3), segment(1),
    label(1: 1=foreground), instance(1)]
  * `{scene}_freemasks.npy`: (P, K) masks KDTree-rebased from the
    (axis-aligned) pseudo-mask clouds onto the aligned full-res points
  * benchmark gt txt `sem*1000 + inst + 1`
  * `{mode}_database.yaml` + color_mean_std.yaml

  python preprocessing/freemask_preprocessing.py \
      --scans_dir data/ScanNet/scans --label_tsv .../scannetv2-labels.combined.tsv \
      --save_dir data/processed/unscene3d_dino_csc \
      --freemask_dir outputs/unscene3d_dino_csc [--oracle]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from unscene3d_tpu.data.ply import read_ply
from unscene3d_tpu.data.scannet_constants import load_label_map
from unscene3d_tpu.data.scannet_pseudo import apply_alignment, load_axis_alignment

# raw ScanNet ids excluded from foreground in oracle mode (wall, floor, and
# unannotated); everything else becomes the single 'foreground' class
BACKGROUND_RAW_IDS = {0, 1, 3}


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    out = np.zeros_like(verts)
    for k in range(3):
        np.add.at(out, faces[:, k], fn)
    norm = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norm, 1e-12)


def process_scene(scene_dir: Path, label_map: dict, save_dir: Path, mode: str,
                  freemask_dir: Path | None, oracle: bool):
    scene = scene_dir.name
    mesh = read_ply(str(scene_dir / f"{scene}_vh_clean_2.ply"))
    coords = mesh["vertices"].astype(np.float64)
    colors = mesh["colors"].astype(np.float32)
    normals = vertex_normals(coords, mesh["faces"])

    with open(next(scene_dir.glob("*[0-9].segs.json"))) as f:
        segments = np.asarray(json.load(f)["segIndices"])
    segment_ids = np.unique(segments, return_inverse=True)[1]
    with open(scene_dir / f"{scene}.aggregation.json") as f:
        agg = json.load(f)["segGroups"]

    sem = np.zeros(len(coords), np.int64)
    inst = np.full(len(coords), -1, np.int64)
    for group in agg:
        mask = np.isin(segments, group["segments"])
        sem[mask] = label_map.get(group["label"], 0)
        inst[mask] = group["objectId"]

    fg = ~np.isin(sem, list(BACKGROUND_RAW_IDS))
    labels = np.zeros((len(coords), 2), np.int64)
    labels[fg, 0] = 1
    labels[:, 1] = np.where(fg, inst, -1)

    points = np.hstack([coords, colors, normals, segment_ids[:, None], labels])

    mode_dir = save_dir / mode
    mode_dir.mkdir(parents=True, exist_ok=True)
    npy_path = mode_dir / f"{scene.replace('scene', '')}.npy"
    np.save(npy_path, points.astype(np.float32))

    gt_dir = save_dir / "instance_gt" / mode
    gt_dir.mkdir(parents=True, exist_ok=True)
    gt = points[:, -2] * 1000 + points[:, -1] + 1
    np.savetxt(gt_dir / f"{scene}.txt", gt.astype(np.int32), fmt="%d")

    aligned = apply_alignment(coords, load_axis_alignment(str(scene_dir / f"{scene}.txt")))

    if oracle:
        ids = sorted(set(np.unique(labels[fg, 1])) - {-1})
        masks = np.zeros((len(coords), len(ids)), np.float32)
        for k, iid in enumerate(ids):
            masks[labels[:, 1] == iid, k] = 1.0
    else:
        try:
            cloud = np.load(freemask_dir / f"{scene}_cloud.npy")
            raw_masks = np.load(freemask_dir / f"{scene}_masks.npy")
        except (FileNotFoundError, TypeError):
            print(f"no pseudo masks for {scene}")
            return None
        from scipy.spatial import KDTree

        _, match = KDTree(cloud[:, :3]).query(aligned, k=1)
        masks = raw_masks[match].astype(np.float32)

    np.save(mode_dir / f"{scene.replace('scene', '')}_freemasks.npy", masks)

    return {
        "filepath": str(npy_path),
        "raw_filepath": str(scene_dir / f"{scene}_vh_clean_2.ply"),
        "scene": scene,
        "color_mean": (colors / 255.0).mean(0).tolist(),
        "color_std": ((colors / 255.0) ** 2).mean(0).tolist(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans_dir", required=True)
    ap.add_argument("--label_tsv", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--freemask_dir", default=None)
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--splits_dir", default=None)
    ap.add_argument("--n_jobs", type=int, default=-1,
                    help="joblib processes; -1 = all cores (reference "
                         "base_preprocessing.py:46-48)")
    args = ap.parse_args()

    save_dir = Path(args.save_dir)
    label_map = load_label_map(args.label_tsv, to="id")

    splits = {"train": None, "validation": None}
    if args.splits_dir:
        for mode, fname in (("train", "scannetv2_train.txt"),
                            ("validation", "scannetv2_val.txt")):
            p = Path(args.splits_dir) / fname
            if p.exists():
                splits[mode] = {l.strip() for l in open(p) if l.strip()}

    scenes = sorted(d for d in Path(args.scans_dir).iterdir() if d.is_dir())

    def scene_mode(scene_dir):
        for m, names in splits.items():
            if names and scene_dir.name in names:
                return m
        return "train"

    fm_dir = Path(args.freemask_dir) if args.freemask_dir else None
    jobs = [(d, scene_mode(d)) for d in scenes]
    import multiprocessing

    from joblib import Parallel, delayed

    n_jobs = multiprocessing.cpu_count() if args.n_jobs == -1 else args.n_jobs
    print(f"{len(jobs)} scenes, {n_jobs} workers")
    results = Parallel(n_jobs=n_jobs, verbose=5)(
        delayed(process_scene)(d, label_map, save_dir, m, fm_dir, args.oracle)
        for d, m in jobs)
    databases = {"train": [], "validation": []}
    for (d, m), entry in zip(jobs, results):
        if entry:
            databases[m].append(entry)

    for mode, db in databases.items():
        if db:
            with open(save_dir / f"{mode}_database.yaml", "w") as f:
                yaml.safe_dump(db, f)
    # aggregate color stats (reference :224-241)
    train_db = databases["train"]
    if train_db:
        mean = np.mean([e["color_mean"] for e in train_db], 0)
        sq = np.mean([e["color_std"] for e in train_db], 0)
        std = np.sqrt(sq - mean ** 2)
        with open(save_dir / "color_mean_std.yaml", "w") as f:
            yaml.safe_dump({"mean": mean.tolist(), "std": std.tolist()}, f)


if __name__ == "__main__":
    main()
