"""Project 2D instance masks (e.g. CutLER) into 3D and evaluate vs GT
(reference pseudo_masks/eval_cutler_projection_performance.py /
eval_cutler_images.py): per frame, each 2D mask id is splat onto the visible
voxels via the z-buffer projection; voxels take their majority mask id per
frame and instances are merged across frames by voxel-overlap.

  python eval_cutler_projection.py --masks_dir cutler_outputs \
      --gt_dir data/ScanNet/scannet_200_insseg --scans_dir data/ScanNet/scans

masks_dir layout: {scene}/{frame}.png (uint8/16 instance-id maps, 0 = none).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def project_frame_masks(mask_img, world_pts, pose, K):
    """Returns per-voxel 2D instance id (0 = none) for one frame."""
    import jax.numpy as jnp

    from unscene3d_tpu.pseudo.projection import project_2d_features

    h, w = mask_img.shape
    ids = np.unique(mask_img)
    ids = ids[ids > 0]
    if len(ids) == 0:
        return np.zeros(len(world_pts), np.int64)
    onehot = (mask_img[None, :, :, None] == ids[None, None, None, :]).astype(np.float32)
    feats, cnt = project_2d_features(
        jnp.asarray(onehot), jnp.asarray(world_pts.astype(np.float32)),
        jnp.ones(len(world_pts), bool),
        jnp.asarray(pose[None].astype(np.float32)),
        jnp.asarray(K.astype(np.float32)), h, w,
    )
    feats, cnt = np.asarray(feats), np.asarray(cnt)
    best = feats.argmax(-1)
    hit = (cnt > 0) & (feats.max(-1) > 0.5)
    return np.where(hit, ids[best], 0)


def merge_instances(per_frame_ids: list[np.ndarray], min_overlap: float = 0.3,
                    min_size: int = 50) -> np.ndarray:
    """Greedy cross-frame merge by voxel overlap; returns (N, K) bool masks."""
    masks = []
    for f, ids in enumerate(per_frame_ids):
        for i in np.unique(ids[ids > 0]):
            m = ids == i
            if m.sum() < min_size:
                continue
            merged = False
            for k, existing in enumerate(masks):
                inter = (m & existing).sum()
                if inter / min(m.sum(), existing.sum()) > min_overlap:
                    masks[k] = existing | m
                    merged = True
                    break
            if not merged:
                masks.append(m)
    return (np.stack(masks, 1) if masks
            else np.zeros((len(per_frame_ids[0]), 0), bool))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--masks_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--scans_dir", required=True)
    ap.add_argument("--max_scenes", type=int, default=-1)
    ap.add_argument("--frame_skip", type=int, default=20)
    args = ap.parse_args()

    from PIL import Image

    from unscene3d_tpu.data.scannet_pseudo import ScanNetPseudoDataset, VOXEL_SIZE
    from unscene3d_tpu.eval.instance_eval import evaluate_instances

    ds = ScanNetPseudoDataset(args.gt_dir, scans_path=args.scans_dir,
                              frame_skip=args.frame_skip)
    # restrict to the fixed validation scene subset when available
    # (reference eval_cutler_images.py:79 uses constants VAL_SCENES)
    from unscene3d_tpu.data.dataset_sets import val_scenes

    fixed_val = set(val_scenes(args.gt_dir))
    scenes = [s for s in ds.scenes
              if os.path.isdir(os.path.join(args.masks_dir, s))
              and (not fixed_val or s in fixed_val)]
    if args.max_scenes > 0:
        scenes = scenes[: args.max_scenes]

    preds, gts = {}, {}
    for scene in scenes:
        points, _, _, inst = ds.get_full_cloud(scene)
        base = os.path.join(args.scans_dir, scene)
        K = np.loadtxt(os.path.join(base, "intrinsic", "intrinsic_color.txt"))[:3, :3]
        per_frame = []
        for mask_file in sorted(Path(args.masks_dir, scene).glob("*.png"))[:: 1]:
            img = np.asarray(Image.open(mask_file))
            pose = np.loadtxt(os.path.join(base, "pose", mask_file.stem + ".txt"))
            scale = np.array([img.shape[1] / 1296.0, img.shape[0] / 968.0, 1.0])
            per_frame.append(project_frame_masks(img, points, pose, K * scale[:, None]))
        if not per_frame:
            continue
        masks = merge_instances(per_frame)
        k = masks.shape[1]
        preds[scene] = {"masks": masks, "classes": np.ones(k, np.int64),
                        "scores": np.linspace(0.9, 0.5, max(k, 1))[:k]}
        gts[scene] = np.where(inst >= 0, 1000 + inst.astype(np.int64) + 1, 0)
        print(f"{scene}: {k} projected instances")

    if preds:
        res = evaluate_instances(preds, gts, min_region_size=10)
        print(f"AP {res['all_ap']:.4f}  AP50 {res['all_ap_50%']:.4f}  "
              f"AP25 {res['all_ap_25%']:.4f}")


if __name__ == "__main__":
    main()
