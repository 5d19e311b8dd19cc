"""Self-train AP trajectory in miniature (VERDICT r4 next#5).

The reference's central claim is that self-training raises class-agnostic
val AP round-over-round (scripts/mask3d_DINO_CSC_self_train.sh: AP50 0.234
-> 0.298 -> 0.319 -> 0.321). This script reproduces that dynamic on a
synthetic oracle set where the headroom is controlled:

  * train split: DEGRADED freemasks -- a fraction of instances dropped
    entirely and the rest randomly eroded (stand-in for pseudo-mask recall
    gaps);
  * validation split: ORACLE freemasks (true GT) -- AP measures real
    segmentation quality, not agreement with the degraded labels;
  * each round trains from the previous round's checkpoint
    (shape-tolerant partial restore, fresh optimizer -- the reference's
    round-k semantics), exports its confident predictions in the freemask
    format, and the next round's dataset merges instances whose
    novel-area ratio > 0.5 (data/freemask_dataset.py::_merge_self_train,
    reference datasets/freemask_semseg.py:224-265).

Dropped instances are exactly what the merge rule recovers: the model
generalizes them from other scenes, its predictions cover them, and the
next round trains on the recovered masks. Prints one JSON line with the
AP50 trajectory; run on the TPU chip (tiny scenes, ~minutes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def degrade_masks(masks: np.ndarray, rng: np.random.RandomState,
                  drop: float, erode: float) -> np.ndarray:
    """Drop whole instances w.p. `drop` (keep >= 1), erode survivors by
    removing each point w.p. `erode` (keep masks non-empty)."""
    K = masks.shape[1]
    keep = rng.rand(K) >= drop
    if not keep.any():
        keep[rng.randint(K)] = True
    out = []
    for k in range(K):
        if not keep[k]:
            continue
        m = masks[:, k].copy()
        er = rng.rand(m.sum()) < erode
        idx = np.nonzero(m)[0]
        m[idx[er]] = False
        if m.sum() >= 10:
            out.append(m)
    if not out:
        out = [masks[:, int(np.argmax(masks.sum(0)))]]
    return np.stack(out, axis=1)


def write_dataset(root: str, n_train: int = 12, n_val: int = 4,
                  num_points: int = 2500, num_objects: int = 5,
                  drop: float = 0.5, erode: float = 0.3, seed: int = 0):
    from unscene3d_tpu.data.synthetic import make_scene

    rng = np.random.RandomState(seed + 777)
    for mode, n, start in (("train", n_train, 0), ("validation", n_val, 1000)):
        os.makedirs(f"{root}/{mode}", exist_ok=True)
        db = []
        for i in range(n):
            s = make_scene(num_points=num_points, num_objects=num_objects,
                           seed=seed + start + i)
            npts = len(s["xyz"])
            normals = np.tile([0, 0, 1.0], (npts, 1))
            pts = np.hstack([
                s["xyz"], s["colors"] * 255.0, normals,
                s["segments"][:, None].astype(np.float64),
                s["labels"][:, None].astype(np.float64),
                s["instances"][:, None].astype(np.float64),
            ]).astype(np.float32)
            path = f"{root}/{mode}/{start + i:04d}_00.npy"
            np.save(path, pts)
            masks = s["masks"].astype(bool)
            if mode == "train":
                masks = degrade_masks(masks, rng, drop, erode)
            np.save(path.replace(".npy", "_freemasks.npy"),
                    masks.astype(np.float32))
            db.append({"filepath": path,
                       "raw_filepath": f"/x/scene{start + i:04d}_00/mesh.ply",
                       "file_len": int(npts)})
        with open(f"{root}/{mode}_database.yaml", "w") as f:
            yaml.safe_dump(db, f)


BASE_OVERRIDES = [
    "data/datasets=freemask",
    "data.batch_size=4",
    "data.voxel_size=0.12",
    "data.num_workers=1",
    "model.hidden_dim=48",
    "model.num_queries=16",
    "model.num_heads=2",
    "model.dim_feedforward=96",
    "model.num_decoders=1",
    "model.sample_sizes=[32,64,128,256,512]",
    "model.backbone._target_=unscene3d_tpu.models.backbone.Res16UNet14A",
    "trainer.check_val_every_n_epoch=1000",
    "general.eval_min_region_size=10",
]


def run(root: str, out_root: str, rounds: int = 3, epochs: int = 40,
        num_self_train: int = 8):
    from main_instance_segmentation import build_experiment, get_parameters
    from unscene3d_tpu.data.freemask_dataset import FreeMaskDataset

    traj = []
    prev_dir = None
    for r in range(1, rounds + 1):
        save_dir = os.path.join(out_root, f"round{r}")
        ov = BASE_OVERRIDES + [
            f"general.data_dir={root}",
            f"general.save_dir={save_dir}",
            f"general.experiment_name=self_train_r{r}",
            f"trainer.max_epochs={epochs}",
        ]
        if prev_dir is not None:
            ov += [
                "optimizer=adamw_lower",
                "data.datasets.train_dataset.load_self_train_data=true",
                f"data.datasets.train_dataset.self_train_data_dir={prev_dir}",
                f"data.datasets.train_dataset.num_self_train_data={num_self_train}",
                f"general.checkpoint={prev_dir}/checkpoints",
            ]
        cfg = get_parameters(ov)
        exp = build_experiment(cfg)
        t0 = time.time()
        state = exp.fit(max_epochs=epochs)
        results = exp.evaluate(state, exp.validation_dataset,
                               with_boxes=False)
        ap50 = float(results["all_ap_50%"])
        print(f"[traj] round {r}: val AP50={ap50:.3f} AP={results['all_ap']:.3f} "
              f"AP25={results['all_ap_25%']:.3f} ({time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        traj.append({"round": r, "ap50": ap50,
                     "ap": float(results["all_ap"]),
                     "ap25": float(results["all_ap_25%"])})
        # export predictions over the TRAIN scenes for the next round's merge
        export_ds = FreeMaskDataset(data_dir=root, mode="train", augment=False)
        exp.evaluate(state, export_ds, save_for_freemask=True,
                     with_boxes=False)
        prev_dir = save_dir
    print(json.dumps({"trajectory": traj}))
    return traj


if __name__ == "__main__":
    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    root = os.environ.get("TRAJ_DATA", "/tmp/unscene3d_traj/data")
    out = os.environ.get("TRAJ_OUT", "/tmp/unscene3d_traj/runs")
    if not os.path.exists(os.path.join(root, "train_database.yaml")):
        write_dataset(root)
    run(root, out,
        rounds=int(os.environ.get("TRAJ_ROUNDS", "3")),
        epochs=int(os.environ.get("TRAJ_EPOCHS", "40")))
