"""3RScan (RIO) preprocessing (reference
datasets/preprocessing/rio_preprocessing.py:19-123).

`mesh.refined.obj` scenes (with per-vertex colors) + `semseg.json` /
`*.segs.json` -> Mask3D-format npy; labels mapped Label -> NYU40 via the
3RScan `mapping.tsv`.

  python preprocessing/rio_preprocessing.py \
      --data_dir data/raw/rio --save_dir data/processed/rio \
      --mapping_tsv .../mapping.tsv --splits_dir .../splits [--n_jobs -1]
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from preprocessing.base import (BaseParallelPreprocessing,
                                load_obj_with_normals)
from unscene3d_tpu.data.scannet_constants import (CLASS_LABELS_20,
                                                  VALID_CLASS_IDS_20)

_NYU_NAME_TO_ID = dict(zip(CLASS_LABELS_20, VALID_CLASS_IDS_20))


class RioPreprocessing(BaseParallelPreprocessing):
    def __init__(self, data_dir, save_dir, mapping_tsv=None, splits_dir=None,
                 modes=("train", "validation", "test"), n_jobs=-1):
        super().__init__(data_dir, save_dir, modes, n_jobs)
        self.rio_to_nyu = {}
        if mapping_tsv and Path(mapping_tsv).exists():
            with open(mapping_tsv, newline="") as f:
                reader = csv.reader(f, delimiter="\t")
                cols = next(reader)
                raw_i = cols.index("Label")
                nyu_i = cols.index("NYU40 Mapping")
                for row in reader:
                    self.rio_to_nyu[row[raw_i]] = row[nyu_i]

        for mode in self.modes:
            scene_names = None
            if splits_dir:
                special = "val" if mode == "validation" else mode
                split = Path(splits_dir) / f"{special}.txt"
                if split.exists():
                    scene_names = [l.strip() for l in split.read_text().splitlines()
                                   if l.strip()]
            if scene_names is None:
                scene_names = sorted(d.name for d in self.data_dir.iterdir()
                                     if (d / "mesh.refined.obj").exists())
            self.files[mode] = [self.data_dir / s / "mesh.refined.obj"
                                for s in scene_names
                                if (self.data_dir / s / "mesh.refined.obj").exists()]

    def process_file(self, filepath, mode):
        filepath = Path(filepath)
        scene_id = filepath.parent.name
        filebase = {"filepath": "", "raw_filepath": str(filepath),
                    "file_len": -1}
        coords, features = load_obj_with_normals(filepath)
        filebase["file_len"] = len(coords)
        points = np.hstack((coords, features))

        if mode in ("train", "validation"):
            semseg = filepath.parent / "semseg.json"
            segs = next(filepath.parent.glob("*.segs.json"))
            filebase["raw_instance_filepath"] = str(semseg)
            filebase["raw_segmentation_filepath"] = str(segs)
            segments = np.array(self._read_json(segs)["segIndices"])
            labels = np.full((points.shape[0], 2), -1)
            for instance in self._read_json(semseg)["segGroups"]:
                occupied = np.isin(segments, np.array(instance["segments"]))
                labels[occupied, 1] = instance["id"]
                nyu_name = self.rio_to_nyu.get(instance["label"], instance["label"])
                labels[occupied, 0] = _NYU_NAME_TO_ID.get(nyu_name, -1)
            points = np.hstack((points, labels))
            filebase.update(self.color_stats(features[:, :3]))

        out = self.save_dir / mode / f"{scene_id}.npy"
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(out, points.astype(np.float32))
        filebase["filepath"] = str(out)
        return filebase


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--mapping_tsv", default=None)
    ap.add_argument("--splits_dir", default=None)
    ap.add_argument("--modes", default="train,validation,test")
    ap.add_argument("--n_jobs", type=int, default=-1)
    args = ap.parse_args()
    RioPreprocessing(
        args.data_dir, args.save_dir, mapping_tsv=args.mapping_tsv,
        splits_dir=args.splits_dir, modes=tuple(args.modes.split(",")),
        n_jobs=args.n_jobs).preprocess()


if __name__ == "__main__":
    main()
