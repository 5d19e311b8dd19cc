"""End-to-end artifact-format cross-check (VERDICT r2 #5).

Drives the full on-disk chain the two apps share with the reference:
pseudo-mask npys ({scene}_cloud.npy + {scene}_masks.npy,
pseudo_masks/unscene3d_pseudo_main.py:665-667) -> freemask preprocessing
(Mask3D-format scene npy + _freemasks.npy + instance_gt txt,
datasets/preprocessing/freemask_preprocessing.py:193-218) -> FreeMaskDataset
-> benchmark-submission export (trainer/trainer.py:168-187 format) -> parse
back + file-based evaluation == in-memory evaluation, byte-level formats
throughout.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from preprocessing.freemask_preprocessing import process_scene
from tests.test_preprocessors import _write_scannet_scene
from unscene3d_tpu.data.freemask_dataset import FreeMaskDataset
from unscene3d_tpu.eval.benchmark_export import (
    export_gt,
    export_predictions,
    read_predictions,
)
from unscene3d_tpu.eval.instance_eval import evaluate, evaluate_instances


def test_artifact_chain_roundtrip(tmp_path):
    scans = tmp_path / "scans"
    scene = "scene0000_00"
    _write_scannet_scene(scans, scene, n=400, seed=3)

    # ---- stage 1: pseudo-mask outputs in the reference npy format
    mesh_xyz = None
    from unscene3d_tpu.data.ply import read_ply

    mesh = read_ply(str(scans / scene / f"{scene}_vh_clean_2.ply"))
    mesh_xyz = mesh["vertices"].astype(np.float64)
    k = 3
    pm = np.zeros((len(mesh_xyz), k), np.float32)
    # spatially compact masks (XY quadrants) so the dataset's extent-ratio
    # filter (reference freemask_semseg.py:305-315) keeps them
    midx, midy = np.median(mesh_xyz[:, 0]), np.median(mesh_xyz[:, 1])
    quads = [(mesh_xyz[:, 0] < midx) & (mesh_xyz[:, 1] < midy),
             (mesh_xyz[:, 0] >= midx) & (mesh_xyz[:, 1] < midy),
             (mesh_xyz[:, 0] < midx) & (mesh_xyz[:, 1] >= midy)]
    for i, q in enumerate(quads):
        pm[q, i] = 1.0
    freemask_dir = tmp_path / "pseudo"
    freemask_dir.mkdir()
    np.save(freemask_dir / f"{scene}_cloud.npy",
            np.hstack([mesh_xyz, np.zeros((len(mesh_xyz), 3))]).astype(np.float32))
    np.save(freemask_dir / f"{scene}_masks.npy", pm)

    # ---- stage 2: freemask preprocessing consumes them
    save_dir = tmp_path / "processed"
    label_map = {"chair": 5, "table": 7}
    entry = process_scene(scans / scene, label_map, save_dir, "train",
                          freemask_dir, oracle=False)
    assert entry is not None
    npy = np.load(entry["filepath"])
    assert npy.shape[1] == 12          # xyz rgb normal segment label instance
    masks_file = entry["filepath"].replace(".npy", "_freemasks.npy")
    assert np.load(masks_file).shape[1] == k
    gt_txt = save_dir / "instance_gt" / "train" / f"{scene}.txt"
    assert gt_txt.exists()

    # ---- stage 3: dataset loads the processed scene
    (save_dir / "train_database.yaml").write_text(json.dumps([
        {"filepath": str(Path(entry["filepath"]).resolve())}
    ]))
    ds = FreeMaskDataset(str(save_dir), mode="train", augment=False)
    s = ds[0]
    assert s["masks"].shape[0] == npy.shape[0]

    # ---- stage 4: export predictions in the benchmark submission format,
    # parse them back, and check file-based eval == in-memory eval
    preds_masks = s["masks"].astype(bool)
    kk = preds_masks.shape[1]
    classes = np.ones(kk, np.int64)
    scores = np.linspace(0.9, 0.5, kk)
    out_dir = tmp_path / "eval_output"
    export_predictions(str(out_dir), scene, preds_masks, classes, scores)
    # main txt + per-instance mask files exist in the reference layout
    lines = (out_dir / f"{scene}.txt").read_text().strip().split("\n")
    assert len(lines) == kk
    rel, label, conf = lines[0].split()
    assert rel == f"pred_mask/{scene}_0.txt" and label == "1"

    parsed = read_predictions(str(out_dir), scene)
    np.testing.assert_array_equal(parsed["masks"], preds_masks)
    np.testing.assert_array_equal(parsed["classes"], classes)
    np.testing.assert_allclose(parsed["scores"], scores)

    gt_ids = np.loadtxt(gt_txt, dtype=np.int64)
    # freemask preset: class-agnostic -> remap sem to foreground (1)
    gt_fg = np.where(gt_ids > 0, 1000 + (gt_ids % 1000), 0)

    gt_dir = tmp_path / "gt"
    export_gt(str(gt_dir), scene, gt_fg)

    mem = evaluate_instances({scene: {"masks": preds_masks,
                                      "classes": classes,
                                      "scores": scores}},
                             {scene: gt_fg}, min_region_size=10)
    filed = evaluate({scene: parsed}, str(gt_dir), dataset="freemask",
                 min_region_size=10)  # tiny synthetic scenes
    for key in ("all_ap", "all_ap_50%", "all_ap_25%"):
        assert filed[key] == pytest.approx(mem[key], abs=1e-9), key
