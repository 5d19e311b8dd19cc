"""Evaluate pseudo-mask quality against GT instances (reference
pseudo_masks/eval_freemask_gt_performance.py:22-100).

Loads `{scene}_cloud.npy` / `{scene}_masks.npy` pseudo outputs, matches them
to the scannet200_insseg GT clouds and reports class-agnostic AP
(min_region 10, like the pseudo app's Evaluator).

  python eval_freemask_gt_performance.py --masks_dir outputs/unscene3d_dino_csc \
      --gt_dir data/ScanNet/scannet_200_insseg [--phase val] [--max_scenes N]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--masks_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--phase", default="val")
    ap.add_argument("--max_scenes", type=int, default=-1)
    ap.add_argument("--hard_mask_threshold", type=float, default=0.5)
    ap.add_argument("--max_extent_ratio", type=float, default=0.8,
                    help="ScanNetFree XY instance-to-scene extent filter "
                         "(scannet_free.py:322-338); <=0 disables")
    args = ap.parse_args()

    import torch

    from unscene3d_tpu.data.pseudo_datasets import ScanNetFreeDataset
    from unscene3d_tpu.eval.instance_eval import evaluate_instances

    split_file = os.path.join(args.gt_dir, f"{args.phase}.txt")
    if os.path.exists(split_file):
        scenes = [l.strip() for l in open(split_file) if l.strip()]
    else:
        scenes = sorted(p.stem.replace("_cloud", "")
                        for p in Path(args.masks_dir).glob("*_cloud.npy"))
    if args.max_scenes > 0:
        scenes = scenes[: args.max_scenes]

    # reference-faithful mask loading: hard threshold + extent filter via the
    # ScanNetFree dataset (pseudo_masks/eval_freemask_gt_performance.py:43-47)
    dataset = ScanNetFreeDataset(
        masks_path=args.masks_dir, scannet_insseg_path=args.gt_dir,
        phase=args.phase, oracle_mode=False,  # explicit: score pseudo masks

        hard_mask_threshold=args.hard_mask_threshold,
        instance_to_scene_max_ratio=(args.max_extent_ratio
                                     if args.max_extent_ratio > 0 else 1e9))

    preds, gts = {}, {}
    for scene in scenes:
        cloud_p = os.path.join(args.masks_dir, f"{scene}_cloud.npy")
        gt_p = os.path.join(args.gt_dir, f"{scene}.pth")
        if not (os.path.exists(cloud_p) and os.path.exists(gt_p)):
            continue
        cloud = np.load(cloud_p)
        _, _, _, _, masks = dataset.load_unsupervised_scene(scene)
        points, _, sem, inst = [np.asarray(x) for x in
                                torch.load(gt_p, map_location="cpu",
                                           weights_only=False)[:4]]
        if len(points) != len(cloud):
            from scipy.spatial import KDTree

            _, match = KDTree(cloud[:, :3]).query(points, k=1)
            masks = masks[match]
        # class-agnostic GT: every annotated instance becomes 'foreground'
        gt = np.where(inst >= 0, 1000 + inst.astype(np.int64) + 1, 0)
        k = masks.shape[1]
        preds[scene] = {
            "masks": masks,
            "classes": np.ones(k, np.int64),
            # rank masks by size (the pseudo gen emits them greedily; the
            # reference scores them by confidence=1 as well)
            "scores": np.linspace(0.9, 0.5, max(k, 1))[:k],
        }
        gts[scene] = gt
        print(f"{scene}: {k} masks, {len(np.unique(inst[inst >= 0]))} gt")

    if not preds:
        print("no scenes evaluated")
        return
    res = evaluate_instances(preds, gts, min_region_size=10)
    print(f"AP {res['all_ap']:.4f}  AP50 {res['all_ap_50%']:.4f}  "
          f"AP25 {res['all_ap_25%']:.4f}  ({len(preds)} scenes)")


if __name__ == "__main__":
    main()
