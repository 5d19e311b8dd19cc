"""Self-training entry point (reference main_instance_segmentation.py:21-114).

Usage mirrors the reference's Hydra CLI exactly:

  python main_instance_segmentation.py \
      general.experiment_name=DINO_CSC_self_train \
      general.train_on_segments=true general.num_targets=3 \
      data.batch_size=8 data/datasets=freemask \
      general.data_dir=data/processed/unscene3d_dino_csc \
      optimizer=adamw_lower trainer.max_epochs=70 \
      general.checkpoint=saved/prev_round general.resume=True

`general.train_mode=false` runs test/export instead of training.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def get_parameters(overrides):
    from unscene3d_tpu.config import load_config
    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    # multi-host runtime BEFORE any backend touch (SURVEY §2.4: replaces the
    # Lightning per-rank launcher); no-op unless UNSCENE3D_COORDINATOR /
    # UNSCENE3D_DISTRIBUTED request it
    from unscene3d_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    enable_compilation_cache()

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "conf", "config_base_instance_segmentation.yaml")
    cfg = load_config(base, overrides)
    np.random.seed(int(cfg.general.seed))
    return cfg


def build_experiment(cfg):
    from unscene3d_tpu.config import instantiate
    from unscene3d_tpu.train.experiment import Experiment

    model = instantiate(cfg.model)
    matcher = instantiate(cfg.matcher)
    criterion = instantiate(cfg.loss, matcher=matcher)
    train_ds = instantiate(cfg.data.datasets.train_dataset)
    val_ds = instantiate(cfg.data.datasets.validation_dataset)
    test_ds = instantiate(cfg.data.datasets.test_dataset)
    collator = instantiate(cfg.data.collation_functions.train_collation,
                           build_triplane=criterion.weight_noise_robust != 0.0)
    eval_collator = instantiate(
        cfg.data.collation_functions.validation_collation,
        build_triplane=criterion.weight_noise_robust != 0.0)
    return Experiment(cfg, model, criterion, train_ds, val_ds, test_ds,
                      collator, eval_collator=eval_collator)


def train(cfg):
    exp = build_experiment(cfg)
    return exp.fit(
        seed=int(cfg.general.seed),
        resume=bool(cfg.general.resume),
        checkpoint=cfg.general.checkpoint,
    )


def test(cfg):
    exp = build_experiment(cfg)
    return exp.test(
        checkpoint=cfg.general.checkpoint,
        save_for_freemask=bool(cfg.general.save_for_freemask),
    )


def main():
    cfg = get_parameters(sys.argv[1:])
    if cfg.general.train_mode:
        train(cfg)
    else:
        test(cfg)


if __name__ == "__main__":
    main()
