"""STPLS3D preprocessing (reference
datasets/preprocessing/stpls3d_preprocessing.py:11-227).

Raw `{mode}/{scene}.txt` CSVs (x,y,z,r,g,b,sem,inst) -> Mask3D-format npy
with dummy normals/segments, per-block 50m crops with benchmark gt txt
(`sem*1000 + reindexed_inst`) for validation/test, a fixed 15-class label
database, and aggregated color stats.

  python preprocessing/stpls3d_preprocessing.py \
      --data_dir data/raw/stpls3d --save_dir data/processed/stpls3d [--n_jobs -1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from preprocessing.base import BaseParallelPreprocessing

CLASS_MAP = {
    "Ground": 0, "Build": 1, "LowVeg": 2, "MediumVeg": 3, "HighVeg": 4,
    "Vehicle": 5, "Truck": 6, "Aircraft": 7, "MilitaryVeh": 8, "Bike": 9,
    "Motorcycle": 10, "LightPole": 11, "StreetSign": 12, "Clutter": 13,
    "Fence": 14,
}

COLOR_MAP = [
    [0, 255, 0], [0, 0, 255], [0, 255, 255], [255, 255, 0], [255, 0, 255],
    [100, 100, 255], [200, 200, 100], [170, 120, 200], [255, 0, 0],
    [200, 100, 100], [10, 200, 100], [200, 200, 200], [50, 50, 50],
    [60, 130, 60], [130, 30, 60],
]


class STPLS3DPreprocessing(BaseParallelPreprocessing):
    def __init__(self, data_dir, save_dir,
                 modes=("train", "validation", "test"), n_jobs=-1,
                 block_size=50.0, block_stride=50.0, min_block_points=10000):
        super().__init__(data_dir, save_dir, modes, n_jobs)
        self.block_size = block_size
        self.block_stride = block_stride
        self.min_block_points = min_block_points
        self.create_label_database()
        for mode in self.modes:
            mode_dir = self.data_dir / mode
            self.files[mode] = (sorted(str(p) for p in mode_dir.glob("*.txt"))
                                if mode_dir.exists() else [])

    def create_label_database(self):
        db = {cid: {"color": COLOR_MAP[cid], "name": name, "validation": True}
              for name, cid in CLASS_MAP.items()}
        self._save_yaml(self.save_dir / "label_database.yaml", db)
        return db

    def split_point_cloud(self, cloud):
        """Overlapping 50m XY blocks (stpls3d_preprocessing.py:206-218)."""
        limit = np.amax(cloud[:, 0:3], axis=0)
        width = int(np.ceil((limit[0] - self.block_size) / self.block_stride)) + 1
        depth = int(np.ceil((limit[1] - self.block_size) / self.block_stride)) + 1
        blocks = []
        for x in range(max(width, 1)):
            for y in range(max(depth, 1)):
                x0, y0 = x * self.block_stride, y * self.block_stride
                cond = ((cloud[:, 0] >= x0) & (cloud[:, 0] <= x0 + self.block_size) &
                        (cloud[:, 1] >= y0) & (cloud[:, 1] <= y0 + self.block_size))
                blocks.append(cloud[cond, :])
        return blocks

    def process_file(self, filepath, mode):
        filepath = Path(filepath)
        scene = filepath.name
        filebase = {"filepath": str(filepath), "scene": scene,
                    "raw_filepath": str(filepath), "file_len": -1,
                    "raw_segmentation_filepath": ""}
        points = np.loadtxt(filepath, delimiter=",")

        ones = np.ones((points.shape[0], 1))
        if mode in ("train", "validation"):
            # columns in: xyz rgb sem inst; add dummy normals + segment id
            points = np.hstack((points, ones, ones, ones, ones))
            # reorder so segments follow RGB and labels go last
            points = points[:, [0, 1, 2, 3, 4, 5, 8, 9, 10, 11, 6, 7]]
        else:
            points = np.hstack((points, ones, ones, ones, ones, ones, ones))
            points = points[:, [0, 1, 2, 3, 4, 5, 8, 9, 10, 11, 6, 7]]

        points[:, :3] -= points[:, :3].min(0)
        points = points.astype(np.float32)
        if mode == "test":
            points = points[:, :-2]
        else:
            points[points[:, -1] == -100.0, -1] = -1
        filebase["file_len"] = len(points)

        out = self.save_dir / mode / f"{scene.replace('.txt', '')}.npy"
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(out, points)
        filebase["filepath"] = str(out)

        if mode in ("validation", "test"):
            filebase["instance_gt_filepath"] = []
            filebase["filepath_crop"] = []
            for block_id, block in enumerate(self.split_point_cloud(points)):
                if len(block) < self.min_block_points:
                    continue
                if mode == "validation":
                    new_inst = np.unique(block[:, -1], return_inverse=True)[1]
                    if new_inst.max() >= 1000:
                        raise ValueError("over 999 instances in a block")
                    gt_data = block[:, -2] * 1000 + new_inst
                    gt_path = (self.save_dir / "instance_gt" / mode /
                               f"{scene.replace('.txt', '')}_{block_id}.txt")
                    gt_path.parent.mkdir(parents=True, exist_ok=True)
                    np.savetxt(gt_path, gt_data.astype(np.int32), fmt="%d")
                    filebase["instance_gt_filepath"].append(str(gt_path))
                crop = self.save_dir / mode / f"{scene.replace('.txt', '')}_{block_id}.npy"
                np.save(crop, block.astype(np.float32))
                filebase["filepath_crop"].append(str(crop))

        filebase.update(self.color_stats(points[:, 3:6]))
        return filebase


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--modes", default="train,validation,test")
    ap.add_argument("--n_jobs", type=int, default=-1)
    args = ap.parse_args()
    STPLS3DPreprocessing(args.data_dir, args.save_dir,
                         modes=tuple(args.modes.split(",")),
                         n_jobs=args.n_jobs).preprocess()


if __name__ == "__main__":
    main()
