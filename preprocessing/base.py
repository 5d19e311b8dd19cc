"""Shared parallel preprocessing harness (reference
datasets/preprocessing/base_preprocessing.py:17-188).

Per-scene jobs fan out over joblib processes; each preprocessor implements
`process_file(filepath, mode) -> filebase-dict | list | None` and the harness
writes `{mode}_database.yaml`, aggregates color mean/std, and applies
dataset-specific label fixes.
"""

from __future__ import annotations

import json
import multiprocessing
from pathlib import Path

import numpy as np
import yaml


class BaseParallelPreprocessing:
    def __init__(self, data_dir: str, save_dir: str,
                 modes: tuple = ("train", "validation", "test"),
                 n_jobs: int = -1):
        self.data_dir = Path(data_dir)
        self.save_dir = Path(save_dir)
        self.n_jobs = n_jobs
        self.modes = tuple(modes)
        if not self.data_dir.exists():
            raise FileNotFoundError(f"data folder {self.data_dir} doesn't exist")
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.files = {mode: [] for mode in self.modes}

    # -------------------------------------------------------------- pipeline
    def preprocess(self):
        n_jobs = multiprocessing.cpu_count() if self.n_jobs == -1 else self.n_jobs
        from joblib import Parallel, delayed

        for mode in self.modes:
            tasks = self.files.get(mode, [])
            print(f"[{self.__class__.__name__}] {mode}: {len(tasks)} scenes, "
                  f"{n_jobs} workers")
            if n_jobs == 1:
                results = [self.process_file(f, mode) for f in tasks]
            else:
                results = Parallel(n_jobs=n_jobs, verbose=5)(
                    delayed(self.process_file)(f, mode) for f in tasks)
            database = []
            for filebase in results:
                if filebase is None:
                    continue
                if isinstance(filebase, list):
                    database.extend(filebase)
                else:
                    database.append(filebase)
            self.save_database(database, mode)
        self.fix_bugs_in_labels()
        self.compute_color_mean_std()

    def process_file(self, filepath, mode):
        raise NotImplementedError

    def fix_bugs_in_labels(self):
        pass

    # -------------------------------------------------------------- database
    def save_database(self, database, mode):
        for element in database:
            self._dict_to_yaml(element)
        self._save_yaml(self.save_dir / f"{mode}_database.yaml", database)

    def joint_database(self, train_modes=("train", "validation")):
        joint = []
        for mode in train_modes:
            joint.extend(self._load_yaml(self.save_dir / f"{mode}_database.yaml"))
        self._save_yaml(self.save_dir / "train_validation_database.yaml", joint)

    def compute_color_mean_std(self, train_database_path=None):
        """Aggregate per-scene color mean / E[x^2] into dataset mean/std
        (base_preprocessing.py:141-155 pattern)."""
        path = Path(train_database_path or self.save_dir / "train_database.yaml")
        if not path.exists():
            return
        db = self._load_yaml(path)
        entries = [s for s in db if "color_mean" in s]
        if not entries:
            return
        mean = np.array([s["color_mean"] for s in entries]).mean(0)
        sq = np.array([s["color_std"] for s in entries]).mean(0)
        std = np.sqrt(np.maximum(sq - mean**2, 0))
        self._save_yaml(self.save_dir / "color_mean_std.yaml",
                        {"mean": [float(x) for x in mean],
                         "std": [float(x) for x in std]})

    # ----------------------------------------------------------------- utils
    @staticmethod
    def color_stats(rgb255: np.ndarray) -> dict:
        unit = np.asarray(rgb255, np.float64) / 255.0
        return {"color_mean": unit.mean(0).tolist(),
                "color_std": (unit**2).mean(0).tolist()}

    @classmethod
    def _read_json(cls, path):
        try:
            with open(path) as f:
                return json.load(f)
        except json.decoder.JSONDecodeError:
            with open(path) as f:
                # some 3RScan/Matterport files contain bad \o escapes
                return json.loads(f.read().replace("\\o", "\\\\o"))

    @classmethod
    def _save_yaml(cls, path, file):
        with open(path, "w") as f:
            yaml.safe_dump(file, f, default_style=None, default_flow_style=False)

    @classmethod
    def _dict_to_yaml(cls, dictionary):
        if not isinstance(dictionary, dict):
            return
        for k, v in dictionary.items():
            if isinstance(v, dict):
                cls._dict_to_yaml(v)
            if isinstance(v, np.ndarray):
                dictionary[k] = v.tolist()
            if isinstance(v, Path):
                dictionary[k] = str(v)

    @classmethod
    def _load_yaml(cls, filepath):
        with open(filepath) as f:
            return yaml.safe_load(f)


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals from triangle faces."""
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    out = np.zeros_like(verts, dtype=np.float64)
    for k in range(3):
        np.add.at(out, faces[:, k], fn)
    return out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)


def load_ply_with_normals(path) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """coords, features (rgb + normals), labels-if-present — the role of the
    reference's utils/point_cloud_utils.load_ply_with_normals."""
    from unscene3d_tpu.data.ply import read_ply

    mesh = read_ply(str(path))
    coords = mesh["vertices"].astype(np.float64)
    colors = mesh.get("colors")
    colors = (np.asarray(colors, np.float64) if colors is not None
              else np.zeros((len(coords), 3)))
    if "normals" in mesh:
        normals = np.asarray(mesh["normals"], np.float64)
    elif "faces" in mesh:
        normals = vertex_normals(coords, np.asarray(mesh["faces"]))
    else:
        normals = np.zeros_like(coords)
    labels = None
    vd = mesh.get("vertex_data")
    if vd is not None and "label" in (vd.dtype.names or ()):
        labels = np.asarray(vd["label"], np.int64)
    return coords, np.hstack([colors, normals]), labels


def load_obj_with_normals(path) -> tuple[np.ndarray, np.ndarray]:
    """Wavefront OBJ with per-vertex colors (3RScan mesh.refined.obj):
    `v x y z [r g b]` lines; normals computed from faces."""
    verts, colors, faces = [], [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                vals = line.split()[1:]
                verts.append([float(v) for v in vals[:3]])
                colors.append([float(v) for v in vals[3:6]] if len(vals) >= 6
                              else [0.0, 0.0, 0.0])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:4]]
                faces.append(idx)
    coords = np.asarray(verts, np.float64)
    colors = np.asarray(colors, np.float64)
    if colors.size and colors.max() <= 1.0 + 1e-9:
        colors = colors * 255.0
    normals = (vertex_normals(coords, np.asarray(faces, np.int64))
               if faces else np.zeros_like(coords))
    return coords, np.hstack([colors, normals])
