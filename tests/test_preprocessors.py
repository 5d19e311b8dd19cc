"""Preprocessing CLIs on synthetic fixtures, run through the joblib-parallel
harness (reference base_preprocessing.py:17-71 + per-dataset preprocessors).
Each test builds a raw-format fixture scene, runs the preprocessor with 2
worker processes, and checks the Mask3D-format outputs."""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest
import yaml

from preprocessing.base import (BaseParallelPreprocessing,
                                load_obj_with_normals, load_ply_with_normals)
from unscene3d_tpu.data.ply import write_ply


def _write_scannet_scene(scans, scene, n=300, seed=0):
    rng = np.random.RandomState(seed)
    d = scans / scene
    d.mkdir(parents=True)
    verts = rng.rand(n, 3).astype(np.float32) * 4
    colors = rng.randint(0, 255, (n, 3))
    faces = np.column_stack([np.arange(n - 2), np.arange(1, n - 1),
                             np.arange(2, n)]).astype(np.int32)
    write_ply(str(d / f"{scene}_vh_clean_2.ply"), verts, colors, faces)
    # labels.ply with per-vertex 'label' property
    labels = rng.randint(1, 40, n)
    write_ply(str(d / f"{scene}_vh_clean_2.labels.ply"), verts, colors, faces,
              extra={"label": labels})
    segs = (np.arange(n) // 30).tolist()
    (d / f"{scene}_vh_clean_2.0.010000.segs.json").write_text(
        json.dumps({"segIndices": segs}))
    agg = {"segGroups": [
        {"id": 0, "objectId": 0, "label": "chair", "segments": [0, 1]},
        {"id": 1, "objectId": 1, "label": "table", "segments": [2, 3]},
    ]}
    (d / f"{scene}.aggregation.json").write_text(json.dumps(agg))
    (d / f"{scene}.txt").write_text(
        "axisAlignment = 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\nsceneType = Office\n")
    return labels


def test_scannet_preprocessing_parallel(tmp_path):
    from preprocessing.scannet_preprocessing import ScannetPreprocessing

    raw = tmp_path / "raw"
    scans = raw / "scans"
    _write_scannet_scene(scans, "scene0000_00", seed=0)
    _write_scannet_scene(scans, "scene0001_00", seed=1)
    splits = tmp_path / "splits"
    splits.mkdir()
    (splits / "scannetv2_train.txt").write_text("scene0000_00\n")
    (splits / "scannetv2_val.txt").write_text("scene0001_00\n")

    save = tmp_path / "out"
    prep = ScannetPreprocessing(str(raw), str(save), splits_dir=str(splits),
                                modes=("train", "validation"), n_jobs=2)
    prep.preprocess()

    train_npy = np.load(save / "train" / "0000_00.npy")
    assert train_npy.shape[1] == 12  # xyz rgb normals segment label instance
    gt = np.loadtxt(save / "instance_gt" / "train" / "scene0000_00.txt")
    assert len(gt) == len(train_npy)
    # gt encoding sem*1000 + inst + 1
    sem, inst = train_npy[:, -2], train_npy[:, -1]
    np.testing.assert_array_equal(gt, (sem * 1000 + inst + 1).astype(np.int32))
    db = yaml.safe_load(open(save / "train_database.yaml"))
    assert len(db) == 1 and db[0]["scene"] == 0
    assert (save / "label_database.yaml").exists()
    assert (save / "color_mean_std.yaml").exists()
    stats = yaml.safe_load(open(save / "color_mean_std.yaml"))
    assert all(0 <= m <= 1 for m in stats["mean"])


def test_matterport_preprocessing_parallel(tmp_path):
    from preprocessing.matterport_preprocessing import MatterportPreprocessing

    rng = np.random.RandomState(3)
    raw = tmp_path / "raw"
    scene_dir = raw / "scans" / "17DRP5sb8fy"
    scene_dir.mkdir(parents=True)

    region = tmp_path / "stage" / "17DRP5sb8fy" / "region_segmentations"
    region.mkdir(parents=True)
    n = 200
    verts = rng.rand(n, 3).astype(np.float32)
    colors = rng.randint(0, 255, (n, 3))
    faces = np.column_stack([np.arange(n - 2), np.arange(1, n - 1),
                             np.arange(2, n)]).astype(np.int32)
    write_ply(str(region / "region0.ply"), verts, colors, faces)
    (region / "region0.vsegs.json").write_text(
        json.dumps({"segIndices": (np.arange(n) // 20).tolist()}))
    (region / "region0.semseg.json").write_text(json.dumps({"segGroups": [
        {"id": 0, "label": "chair", "segments": [0, 1, 2]}]}))
    with zipfile.ZipFile(scene_dir / "region_segmentations.zip", "w") as zf:
        for p in region.rglob("*"):
            zf.write(p, arcname=str(Path("17DRP5sb8fy") /
                                    p.relative_to(region.parent)))

    mapping = tmp_path / "category_mapping.tsv"
    mapping.write_text("index\traw_category\tnyu40class\n1\tchair\tchair\n")

    save = tmp_path / "out"
    prep = MatterportPreprocessing(str(raw), str(save),
                                   category_mapping=str(mapping),
                                   modes=("train",), n_jobs=2)
    prep.preprocess()
    npy = np.load(save / "train" / "17DRP5sb8fy_00.npy")
    assert npy.shape == (n, 11)  # xyz rgb normals label instance
    assert (npy[:60, -2] == 5).all()       # chair -> nyu40 id 5
    assert (npy[:60, -1] == 0).all()


def test_rio_preprocessing_parallel(tmp_path):
    from preprocessing.rio_preprocessing import RioPreprocessing

    rng = np.random.RandomState(4)
    raw = tmp_path / "raw"
    scene = raw / "abc-scan-1"
    scene.mkdir(parents=True)
    n = 150
    verts = rng.rand(n, 3)
    colors = rng.rand(n, 3)
    with open(scene / "mesh.refined.obj", "w") as f:
        for v, c in zip(verts, colors):
            f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        for i in range(n - 2):
            f.write(f"f {i + 1} {i + 2} {i + 3}\n")
    (scene / "mesh.refined.0.010000.segs.json").write_text(
        json.dumps({"segIndices": (np.arange(n) // 15).tolist()}))
    (scene / "semseg.json").write_text(json.dumps({"segGroups": [
        {"id": 0, "label": "sofa", "segments": [0, 1]}]}))
    mapping = tmp_path / "mapping.tsv"
    mapping.write_text("Label\tNYU40 Mapping\nsofa\tsofa\n")

    save = tmp_path / "out"
    prep = RioPreprocessing(str(raw), str(save), mapping_tsv=str(mapping),
                            modes=("train",), n_jobs=2)
    prep.preprocess()
    npy = np.load(save / "train" / "abc-scan-1.npy")
    assert npy.shape == (n, 11)
    assert (npy[:30, -2] == 6).all()       # sofa -> nyu40 id 6
    # obj colors were unit-scale: converted to 0-255
    assert npy[:, 3:6].max() > 1.5


def test_stpls3d_preprocessing_parallel(tmp_path):
    from preprocessing.stpls3d_preprocessing import STPLS3DPreprocessing

    rng = np.random.RandomState(5)
    raw = tmp_path / "raw"
    for mode, scenes in (("train", ["1_points_GTv3"]),
                         ("validation", ["25_points_GTv3"])):
        d = raw / mode
        d.mkdir(parents=True)
        for s in scenes:
            n = 15000
            pts = np.column_stack([
                rng.rand(n) * 60, rng.rand(n) * 60, rng.rand(n) * 10,
                rng.randint(0, 255, n), rng.randint(0, 255, n),
                rng.randint(0, 255, n),
                rng.randint(0, 14, n),
                np.where(rng.rand(n) < 0.1, -100, rng.randint(0, 50, n)),
            ])
            np.savetxt(d / f"{s}.txt", pts, delimiter=",", fmt="%.4f")

    save = tmp_path / "out"
    prep = STPLS3DPreprocessing(str(raw), str(save),
                                modes=("train", "validation"), n_jobs=2,
                                min_block_points=100)
    prep.preprocess()
    train = np.load(save / "train" / "1_points_GTv3.npy")
    assert train.shape[1] == 12
    assert train[:, -1].min() == -1         # -100 remapped to -1
    assert train[:, :3].min() >= 0          # shifted to positive range
    val_crops = sorted((save / "validation").glob("25_points_GTv3_*.npy"))
    assert val_crops
    gt_files = sorted((save / "instance_gt" / "validation").glob("*.txt"))
    assert len(gt_files) == len(val_crops)
    db = yaml.safe_load(open(save / "label_database.yaml"))
    assert db[5]["name"] == "Vehicle"


def test_obj_and_ply_loaders(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    faces = np.array([[0, 1, 2], [0, 1, 3]])
    with open(tmp_path / "m.obj", "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]} 0.5 0.25 1.0\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")
    coords, feats = load_obj_with_normals(tmp_path / "m.obj")
    assert coords.shape == (4, 3) and feats.shape == (4, 6)
    np.testing.assert_allclose(feats[0, :3], [127.5, 63.75, 255])
    assert np.abs(np.linalg.norm(feats[:, 3:6], axis=1) - 1).max() < 1e-9

    write_ply(str(tmp_path / "m.ply"), verts, np.full((4, 3), 10), faces)
    coords, feats, labels = load_ply_with_normals(tmp_path / "m.ply")
    assert labels is None and feats.shape == (4, 6)


def test_base_harness_color_aggregation(tmp_path):
    (tmp_path / "raw").mkdir()

    class _P(BaseParallelPreprocessing):
        def __init__(self):
            super().__init__(str(tmp_path / "raw"), str(tmp_path / "out"),
                             modes=("train",), n_jobs=1)
            self.files["train"] = [1, 2]

        def process_file(self, filepath, mode):
            unit = np.full((10, 3), 0.25 * filepath)
            return {"filepath": f"f{filepath}",
                    "color_mean": unit.mean(0).tolist(),
                    "color_std": (unit**2).mean(0).tolist()}

    _P().preprocess()
    stats = yaml.safe_load(open(tmp_path / "out" / "color_mean_std.yaml"))
    np.testing.assert_allclose(stats["mean"], [0.375] * 3)
    np.testing.assert_allclose(stats["std"], [0.125] * 3)
