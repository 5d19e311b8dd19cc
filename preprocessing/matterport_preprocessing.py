"""Matterport3D region preprocessing (reference
datasets/preprocessing/matterport_preprocessing.py:22-180).

Per-scene `region_segmentations.zip` archives are extracted to a tempdir;
each region ply + its `.semseg.json`/`.vsegs.json` becomes a Mask3D-format
npy with labels mapped raw-category -> nyu40 id via the Matterport
`category_mapping.tsv`.

  python preprocessing/matterport_preprocessing.py \
      --data_dir data/raw/matterport/v1 --save_dir data/processed/matterport \
      --category_mapping .../category_mapping.tsv \
      --splits_dir .../tasks/benchmark [--n_jobs -1]
"""

from __future__ import annotations

import argparse
import csv
import re
import sys
import tempfile
import zipfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from preprocessing.base import (BaseParallelPreprocessing,
                                load_ply_with_normals)
from unscene3d_tpu.data.scannet_constants import (CLASS_LABELS_20,
                                                  VALID_CLASS_IDS_20)

# nyu40 names at their nyu40 ids for the 20-class benchmark subset
_NYU_NAME_TO_ID = dict(zip(CLASS_LABELS_20, VALID_CLASS_IDS_20))


class MatterportPreprocessing(BaseParallelPreprocessing):
    def __init__(self, data_dir, save_dir, category_mapping=None,
                 splits_dir=None, modes=("train", "validation", "test"),
                 n_jobs=-1):
        super().__init__(data_dir, save_dir, modes, n_jobs)
        self.matterport_to_nyu = {}
        if category_mapping and Path(category_mapping).exists():
            with open(category_mapping, newline="") as f:
                reader = csv.reader(f, delimiter="\t")
                cols = next(reader)
                raw_i = cols.index("raw_category")
                nyu_i = cols.index("nyu40class")
                for row in reader:
                    self.matterport_to_nyu[row[raw_i]] = row[nyu_i]

        for mode in self.modes:
            scene_names = None
            if splits_dir:
                special = "val" if mode == "validation" else mode
                split = Path(splits_dir) / f"scenes_{special}.txt"
                if split.exists():
                    scene_names = [l.strip() for l in split.read_text().splitlines()
                                   if l.strip()]
            scans = self.data_dir / "scans"
            if scene_names is None:
                scene_names = (sorted(d.name for d in scans.iterdir() if d.is_dir())
                               if scans.exists() else [])
            self.files[mode] = [scans / s / "region_segmentations.zip"
                                for s in scene_names
                                if (scans / s / "region_segmentations.zip").exists()]

    def _label_id(self, raw_category: str) -> int:
        nyu_name = self.matterport_to_nyu.get(raw_category, raw_category)
        # matterport writes "shower curtain" with a space like our table
        return _NYU_NAME_TO_ID.get(nyu_name, -1)

    def process_file(self, filepath, mode):
        filepath = Path(filepath)
        scene_id = filepath.parent.name
        filebase = []
        with tempfile.TemporaryDirectory() as tempdir:
            with zipfile.ZipFile(filepath) as zf:
                zf.extractall(path=tempdir)
            for region_file in sorted((Path(tempdir) / scene_id).glob("*/*.ply")):
                fbase = {"filepath": "", "raw_filepath": str(filepath),
                         "raw_filepath_in_archive": str(region_file),
                         "file_len": -1}
                coords, features, _ = load_ply_with_normals(region_file)
                fbase["file_len"] = len(coords)
                points = np.hstack((coords, features))

                if mode in ("train", "validation"):
                    semseg = str(region_file).replace(".ply", ".semseg.json")
                    vsegs = str(region_file).replace(".ply", ".vsegs.json")
                    fbase["raw_instance_filepath"] = semseg
                    fbase["raw_segmentation_filepath"] = vsegs
                    segments = np.array(self._read_json(vsegs)["segIndices"])
                    labels = np.full((points.shape[0], 2), -1)
                    for instance in self._read_json(semseg)["segGroups"]:
                        occupied = np.isin(segments, np.array(instance["segments"]))
                        labels[occupied, 1] = instance["id"]
                        labels[occupied, 0] = self._label_id(instance["label"])
                    points = np.hstack((points, labels))
                    fbase.update(self.color_stats(features[:, :3]))

                region_num = int(re.search(r"\d+", region_file.stem).group(0))
                out = self.save_dir / mode / f"{scene_id}_{region_num:02}.npy"
                out.parent.mkdir(parents=True, exist_ok=True)
                np.save(out, points.astype(np.float32))
                fbase["filepath"] = str(out)
                filebase.append(fbase)
        return filebase


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--category_mapping", default=None)
    ap.add_argument("--splits_dir", default=None)
    ap.add_argument("--modes", default="train,validation,test")
    ap.add_argument("--n_jobs", type=int, default=-1)
    args = ap.parse_args()
    MatterportPreprocessing(
        args.data_dir, args.save_dir, category_mapping=args.category_mapping,
        splits_dir=args.splits_dir, modes=tuple(args.modes.split(",")),
        n_jobs=args.n_jobs).preprocess()


if __name__ == "__main__":
    main()
