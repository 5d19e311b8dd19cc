"""CutLER 2D inference wrapper: run the CutLER detectron2 model over ScanNet
RGB frames and write per-frame instance-id maps consumable by
eval_cutler_projection.py (reference pseudo_masks/eval_cutler_images.py:19-27,
which wraps detectron2's demo predictor the same way).

  python eval_cutler_images.py --images_dir data/ScanNet/scans \
      --out_dir cutler_outputs \
      --config CutLER/cutler/model_zoo/configs/CutLER-ImageNet/mask_rcnn_R_50_FPN.yaml \
      --weights cutler_cascade_final.pth [--score_thresh 0.35]

Output layout: {out_dir}/{scene}/{frame}.png -- uint16 id maps (0 = no
instance), sorted by score so lower ids are more confident; exactly what
eval_cutler_projection.py's --masks_dir expects.

CutLER itself is an EXTERNAL model here exactly as in the reference (the
reference imports its checkout: `sys.path.append('.../CutLER/cutler/demo')`).
detectron2 + the CutLER repo/checkpoint must be installed; without them this
CLI exits with instructions instead of failing deep in an import chain. The
runbook (docs/RUNBOOK.md) carries the day-one checklist entry.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np


def build_predictor(config_path: str, weights: str, score_thresh: float):
    try:
        from detectron2.config import get_cfg
        from detectron2.engine import DefaultPredictor
    except ImportError:
        raise SystemExit(
            "detectron2 is not installed. CutLER inference needs an external\n"
            "checkout exactly as the reference does\n"
            "(pseudo_masks/eval_cutler_images.py:19-27):\n"
            "  1. pip install 'git+https://github.com/facebookresearch/detectron2.git'\n"
            "  2. git clone https://github.com/facebookresearch/CutLER\n"
            "  3. download cutler_cascade_final.pth from the CutLER model zoo\n"
            "  4. rerun with --config <CutLER cfg yaml> --weights <pth>\n"
            "If you already have CutLER's 2D outputs, skip this CLI entirely\n"
            "and pass them to eval_cutler_projection.py --masks_dir."
        )
    cfg = get_cfg()
    cfg.merge_from_file(config_path)
    cfg.MODEL.WEIGHTS = weights
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = score_thresh
    cfg.MODEL.DEVICE = "cpu" if not _has_cuda() else "cuda"
    return DefaultPredictor(cfg)


def _has_cuda() -> bool:
    try:
        import torch

        return torch.cuda.is_available()
    except ImportError:
        return False


def masks_to_id_map(instances, h: int, w: int) -> np.ndarray:
    """Overlay predicted masks into one uint16 id map, higher-score masks
    painted LAST (they win overlaps), ids ordered by descending score."""
    id_map = np.zeros((h, w), np.uint16)
    if len(instances) == 0:
        return id_map
    scores = instances.scores.cpu().numpy()
    masks = instances.pred_masks.cpu().numpy()
    order = np.argsort(scores)  # ascending: best painted last
    rank = {int(k): i + 1 for i, k in enumerate(np.argsort(-scores))}
    for k in order:
        id_map[masks[k]] = rank[int(k)]
    return id_map


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_dir", required=True,
                    help="{scene}/{frame}.jpg RGB frames")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--config", required=True, help="CutLER detectron2 cfg yaml")
    ap.add_argument("--weights", required=True, help="CutLER checkpoint .pth")
    ap.add_argument("--score_thresh", type=float, default=0.35)
    ap.add_argument("--frame_stride", type=int, default=1)
    args = ap.parse_args()

    predictor = build_predictor(args.config, args.weights, args.score_thresh)
    from PIL import Image

    scenes = sorted(d for d in os.listdir(args.images_dir)
                    if os.path.isdir(os.path.join(args.images_dir, d)))
    for scene in scenes:
        sdir = Path(args.images_dir) / scene
        frames = sorted(sdir.glob("*.jpg")) + sorted(sdir.glob("*.png"))
        out_scene = Path(args.out_dir) / scene
        out_scene.mkdir(parents=True, exist_ok=True)
        for f in frames[:: args.frame_stride]:
            out_path = out_scene / f"{f.stem}.png"
            if out_path.exists():  # idempotent per frame, like pseudo gen
                continue
            img = np.asarray(Image.open(f).convert("RGB"))[:, :, ::-1]  # BGR
            pred = predictor(img)
            id_map = masks_to_id_map(pred["instances"],
                                     img.shape[0], img.shape[1])
            Image.fromarray(id_map).save(out_path)
        print(f"[cutler] {scene}: {len(frames)} frames", file=sys.stderr)


if __name__ == "__main__":
    main()
