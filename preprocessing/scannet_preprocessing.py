"""Standalone ScanNet / ScanNet200 preprocessing (reference
datasets/preprocessing/scannet_preprocessing.py:15-254).

Raw scans (ply + labels.ply + segs.json + aggregation.json) -> Mask3D-format
npy (columns xyz, rgb, normals, segment_id, label, instance), benchmark gt
txt (`sem*1000 + inst + 1`), label_database.yaml, per-mode database yamls and
aggregated color mean/std. Scene jobs run in joblib processes.

  python preprocessing/scannet_preprocessing.py \
      --data_dir data/raw/scannet --save_dir data/processed/scannet \
      --label_tsv .../scannetv2-labels.combined.tsv \
      --splits_dir .../Tasks/Benchmark [--scannet200] [--n_jobs -1]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from preprocessing.base import (BaseParallelPreprocessing,
                                load_ply_with_normals)
from unscene3d_tpu.data.scannet_constants import (CLASS_LABELS_20,
                                                  CLASS_LABELS_200,
                                                  VALID_CLASS_IDS_20,
                                                  VALID_CLASS_IDS_200)


class ScannetPreprocessing(BaseParallelPreprocessing):
    def __init__(self, data_dir, save_dir, label_tsv=None, splits_dir=None,
                 modes=("train", "validation", "test"), n_jobs=-1,
                 scannet200=False, scans_folder="scans",
                 test_scans_folder="scans_test"):
        super().__init__(data_dir, save_dir, modes, n_jobs)
        self.scannet200 = scannet200
        self.label_tsv = label_tsv
        self._raw2id = {}
        if label_tsv and Path(label_tsv).exists():
            import csv

            with open(label_tsv, newline="") as f:
                for row in csv.DictReader(f, delimiter="\t"):
                    try:
                        self._raw2id[row["raw_category"]] = (
                            int(row["id"]) if scannet200 else int(row["nyu40id"]))
                    except (KeyError, ValueError):
                        continue
        self.create_label_database()

        for mode in self.modes:
            scene_names = None
            if splits_dir:
                special = "val" if mode == "validation" else mode
                split = Path(splits_dir) / f"scannetv2_{special}.txt"
                if split.exists():
                    scene_names = [l.strip() for l in split.read_text().splitlines()
                                   if l.strip()]
            folder = self.data_dir / (test_scans_folder if mode == "test"
                                      else scans_folder)
            if scene_names is None:
                scene_names = (sorted(d.name for d in folder.iterdir() if d.is_dir())
                               if folder.exists() else [])
            self.files[mode] = [folder / s / f"{s}_vh_clean_2.ply"
                                for s in scene_names
                                if (folder / s / f"{s}_vh_clean_2.ply").exists()]

    def create_label_database(self):
        if self.scannet200:
            ids, names = VALID_CLASS_IDS_200, CLASS_LABELS_200
        else:
            ids, names = VALID_CLASS_IDS_20, CLASS_LABELS_20
        rng = np.random.RandomState(0)
        db = {int(i): {"name": n,
                       "color": rng.randint(0, 255, 3).tolist(),
                       "validation": True}
              for i, n in zip(ids, names)}
        self._save_yaml(self.save_dir / "label_database.yaml", db)
        return db

    def process_file(self, filepath, mode):
        filepath = Path(filepath)
        scene, sub_scene = self._parse_scene_subscene(filepath.name)
        filebase = {"filepath": str(filepath), "scene": scene,
                    "sub_scene": sub_scene, "raw_filepath": str(filepath),
                    "file_len": -1}
        coords, features, _ = load_ply_with_normals(filepath)
        filebase["file_len"] = len(coords)
        points = np.hstack((coords, features))

        if mode in ("train", "validation"):
            seg_path = next(filepath.parent.glob("*[0-9].segs.json"))
            agg_path = next(filepath.parent.glob("*.aggregation.json"))
            segments = np.array(self._read_json(seg_path)["segIndices"])
            filebase["raw_segmentation_filepath"] = str(seg_path)
            filebase["raw_instance_filepath"] = str(agg_path)
            segment_ids = np.unique(segments, return_inverse=True)[1]
            points = np.hstack((points, segment_ids[..., None]))

            # labels: prefer the labels.ply 'label' property; fall back to
            # aggregation raw-category names via the tsv map
            label_path = filepath.parent / filepath.name.replace(".ply", ".labels.ply")
            labels_col = None
            if label_path.exists():
                label_coords, _, labels_col = load_ply_with_normals(label_path)
                if not np.allclose(coords, label_coords):
                    raise ValueError(f"{filepath}: labels.ply coords mismatch")
                filebase["raw_label_filepath"] = str(label_path)
            if labels_col is None:
                labels_col = np.zeros(len(coords), np.int64)

            labels = np.stack([labels_col, np.full(len(coords), -1)], axis=1)
            for instance in self._read_json(agg_path)["segGroups"]:
                occupied = np.isin(segments, np.array(instance["segments"]))
                labels[occupied, 1] = instance["id"]
                if self.scannet200 or not label_path.exists():
                    labels[occupied, 0] = self._raw2id.get(instance["label"], 0)
            points = np.hstack((points, labels))
            gt_data = points[:, -2] * 1000 + points[:, -1] + 1
        else:
            seg_candidates = list(filepath.parent.glob("*[0-9].segs.json"))
            segments = (np.array(self._read_json(seg_candidates[0])["segIndices"])
                        if seg_candidates else np.zeros(len(coords), np.int64))
            segment_ids = np.unique(segments, return_inverse=True)[1]
            points = np.hstack((points, segment_ids[..., None]))

        out = self.save_dir / mode / f"{scene:04}_{sub_scene:02}.npy"
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(out, points.astype(np.float32))
        filebase["filepath"] = str(out)
        if mode == "test":
            return filebase

        gt_path = (self.save_dir / "instance_gt" / mode /
                   f"scene{scene:04}_{sub_scene:02}.txt")
        gt_path.parent.mkdir(parents=True, exist_ok=True)
        np.savetxt(gt_path, gt_data.astype(np.int32), fmt="%d")
        filebase["instance_gt_filepath"] = str(gt_path)
        filebase.update(self.color_stats(features[:, :3]))
        return filebase

    def fix_bugs_in_labels(self):
        """Known mislabeled points in scenes 270_00/270_02/384_00
        (scannet_preprocessing.py:233-249); only for the 20-class set."""
        if self.scannet200:
            return
        for (scene, sub_scene), wrong_label in {(270, 0): 50, (270, 2): 50,
                                                (384, 0): 149}.items():
            bug_file = self.save_dir / "train" / f"{scene:04}_{sub_scene:02}.npy"
            if not bug_file.exists():
                continue
            points = np.load(bug_file)
            points = points[points[:, -1] != wrong_label]
            np.save(bug_file, points)
            print(f"fixed labels in {bug_file}")

    @staticmethod
    def _parse_scene_subscene(name):
        m = re.match(r"scene(\d{4})_(\d{2})", name)
        return int(m.group(1)), int(m.group(2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--label_tsv", default=None)
    ap.add_argument("--splits_dir", default=None)
    ap.add_argument("--modes", default="train,validation,test")
    ap.add_argument("--n_jobs", type=int, default=-1)
    ap.add_argument("--scannet200", action="store_true")
    args = ap.parse_args()
    ScannetPreprocessing(
        args.data_dir, args.save_dir, label_tsv=args.label_tsv,
        splits_dir=args.splits_dir, modes=tuple(args.modes.split(",")),
        n_jobs=args.n_jobs, scannet200=args.scannet200).preprocess()


if __name__ == "__main__":
    main()
