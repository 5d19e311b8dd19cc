"""Pseudo-mask generation entry point (reference
pseudo_masks/unscene3d_pseudo_main.py:532-667).

  python pseudo_masks_main.py freemask.modality=both \
      data.scannet_path=data/ScanNet/scannet_200_insseg \
      net.weights_for_inner_model=model_weights/CSC_train_Res16UNet34C_2cm.pth \
      misc.save_dir=outputs/unscene3d_dino_csc

Scenes are processed in batches so the NCut eigensolves run batched on
device; per-scene outputs are idempotent (skip when the npy exists, like the
reference :551-567).
"""

from __future__ import annotations

import os
import sys


def main():
    from unscene3d_tpu.config import load_config
    from unscene3d_tpu.data.scannet_pseudo import ScanNetPseudoDataset
    from unscene3d_tpu.pseudo.ncut import NCutConfig
    from unscene3d_tpu.pseudo.pipeline import PseudoMaskPipeline

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "conf", "pseudo", "default.yaml")
    cfg = load_config(base, sys.argv[1:], conf_dir=os.path.dirname(base))

    dataset = ScanNetPseudoDataset(
        scannet_insseg_path=cfg.data.scannet_path,
        scans_path=cfg.data.scannet_images_path,
        phase=cfg.train.train_phase,
        align_scenes=bool(cfg.data.align_scenes),
        segmentation_threshold=float(cfg.data.segmentation_threshold),
        segments_min_vert_nums=tuple(cfg.data.segments_min_vert_nums),
        use_images=bool(cfg.image_data.use_images) or
        cfg.freemask.modality in ("color", "both"),
        image_resolution=tuple(cfg.image_data.image_resolution),
        downsample_ratio=float(cfg.image_data.downsample_ratio),
    )
    pipeline = PseudoMaskPipeline(
        modality=cfg.freemask.modality,
        method=cfg.freemask.get("method", "ncut"),
        ncut_cfg=NCutConfig(
            affinity_tau=float(cfg.freemask.affinity_tau),
            max_number_of_instances=int(cfg.freemask.max_instance_num),
            similarity_metric=cfg.freemask.similarity_metric,
            max_extent_ratio=float(cfg.freemask.max_extent_ratio),
            min_segment_size=int(cfg.freemask.min_segment_size),
            separation_mode=cfg.freemask.separation_mode,
        ),
        csc_weights=cfg.net.weights_for_inner_model,
        dino_weights=cfg.image_data.model_checkpoint,
        resolution_scale=int(cfg.freemask.resolution_scale),
        aggregation_mode=cfg.freemask.aggregation_mode,
    )

    save_dir = cfg.misc.save_dir
    bs = int(cfg.data.batch_size)
    # host sharding (the reference's submitit_slurm launcher role,
    # pseudo_masks/config/default.yaml:124-125): each host processes the
    # strided slice misc.shard of misc.num_shards; outputs are idempotent
    # per scene so shards never conflict
    num_shards = int(cfg.misc.get("num_shards", 1) or 1)
    shard = int(cfg.misc.get("shard", 0) or 0)
    indices = list(range(shard, len(dataset), num_shards))
    n = len(indices)
    if num_shards > 1:
        print(f"[shard {shard}/{num_shards}] {n} of {len(dataset)} scenes")
    for start in range(0, n, bs):
        scenes = [dataset[indices[i]] for i in range(start, min(start + bs, n))]
        results = pipeline.process_scenes(scenes, save_dir=save_dir)
        done = ", ".join(f"{k}:{v[1].shape[1]}m" for k, v in results.items())
        print(f"[{start + len(scenes)}/{n}] {done}")


if __name__ == "__main__":
    main()
