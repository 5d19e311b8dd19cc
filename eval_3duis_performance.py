"""Geometric clustering baseline vs GT (reference
pseudo_masks/eval_3duis_performance.py): HDBSCAN over scene coordinates as a
no-learning unsupervised-instance baseline, scored with the same
class-agnostic AP as our pseudo masks.

  python eval_3duis_performance.py --gt_dir data/ScanNet/scannet_200_insseg \
      [--phase val] [--max_scenes N] [--min_cluster_size 20]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--phase", default="val")
    ap.add_argument("--max_scenes", type=int, default=-1)
    ap.add_argument("--min_cluster_size", type=int, default=20)
    ap.add_argument("--voxel_size", type=float, default=0.05,
                    help="clustering resolution (downsample before HDBSCAN)")
    args = ap.parse_args()

    import torch

    from unscene3d_tpu.eval.instance_eval import evaluate_instances
    from unscene3d_tpu.ops.hashing import sparse_quantize
    from unscene3d_tpu.pseudo.freemask_utils import lidar_3duis

    split_file = os.path.join(args.gt_dir, f"{args.phase}.txt")
    scenes = [l.strip() for l in open(split_file)] if os.path.exists(split_file) \
        else sorted(p[:-4] for p in os.listdir(args.gt_dir) if p.endswith(".pth"))
    if args.max_scenes > 0:
        scenes = scenes[: args.max_scenes]

    preds, gts = {}, {}
    for scene in scenes:
        path = os.path.join(args.gt_dir, f"{scene}.pth")
        if not os.path.exists(path):
            continue
        points, _, sem, inst = [np.asarray(x) for x in torch.load(
            path, map_location="cpu", weights_only=False)[:4]]
        _, unique_map, inverse_map = sparse_quantize(points, args.voxel_size)
        labels_vox = lidar_3duis(points[unique_map],
                                 min_cluster_size=args.min_cluster_size)
        labels = labels_vox[inverse_map]
        ids = np.unique(labels[labels >= 0])
        masks = np.stack([labels == i for i in ids], 1) if len(ids) else \
            np.zeros((len(points), 0), bool)
        preds[scene] = {
            "masks": masks,
            "classes": np.ones(len(ids), np.int64),
            "scores": np.linspace(0.9, 0.5, max(len(ids), 1))[: len(ids)],
        }
        gts[scene] = np.where(inst >= 0, 1000 + inst.astype(np.int64) + 1, 0)
        print(f"{scene}: {len(ids)} clusters")

    if preds:
        res = evaluate_instances(preds, gts, min_region_size=10)
        print(f"AP {res['all_ap']:.4f}  AP50 {res['all_ap_50%']:.4f}  "
              f"AP25 {res['all_ap_25%']:.4f}")


if __name__ == "__main__":
    main()
