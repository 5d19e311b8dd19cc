"""End-to-end smoke: config -> experiment -> short train -> AP eval.

The oracle-dataset integration test the reference lacks (SURVEY.md §4): with
GT-derived masks and a tiny model, the full pipeline must run and produce AP
metrics.
"""

import os

import numpy as np
import pytest

TINY_OVERRIDES = [
    "data/datasets=synthetic",
    "data.batch_size=2",
    "data.voxel_size=0.12",
    "data.datasets.train_dataset.num_scenes=4",
    "data.datasets.train_dataset.num_points=1500",
    "data.datasets.validation_dataset.num_scenes=2",
    "data.datasets.validation_dataset.num_points=1500",
    "data.datasets.test_dataset.num_scenes=2",
    "data.datasets.test_dataset.num_points=1500",
    "model.hidden_dim=32",
    "model.num_queries=8",
    "model.num_heads=2",
    "model.dim_feedforward=64",
    "model.num_decoders=1",
    "model.sample_sizes=[16,32,64,128,256]",
    "model.backbone._target_=unscene3d_tpu.models.backbone.Res16UNet14A",
    "trainer.max_epochs=2",
    "trainer.check_val_every_n_epoch=2",
]


def test_config_compose_and_overrides():
    from main_instance_segmentation import get_parameters

    cfg = get_parameters(TINY_OVERRIDES + ["general.num_targets=3",
                                           "optimizer=adamw_lower"])
    assert cfg.model.hidden_dim == 32
    assert cfg.model.num_classes == 3          # ${general.num_targets}
    assert cfg.optimizer.lr == pytest.approx(5e-5)
    assert cfg.loss.weight_mask == pytest.approx(5.0)  # ${matcher.cost_mask}
    assert cfg.data.datasets.train_dataset["_target_"].endswith("SyntheticFreeMaskDataset")


def test_train_and_eval_e2e(tmp_path):
    from main_instance_segmentation import build_experiment, get_parameters

    cfg = get_parameters(TINY_OVERRIDES + [
        f"general.save_dir={tmp_path}/run",
        "general.experiment_name=e2e",
    ])
    exp = build_experiment(cfg)
    state = exp.fit(max_epochs=2)
    assert int(state.step) == 2 * exp.steps_per_epoch

    results = exp.evaluate(state, exp.validation_dataset, max_scenes=2)
    for key in ("all_ap", "all_ap_50%", "all_ap_25%"):
        assert key in results and np.isfinite(results[key])
    # checkpoints written
    assert os.path.isdir(f"{tmp_path}/run/checkpoints")
    assert os.path.exists(f"{tmp_path}/run/metrics.csv")


def test_export_for_freemask(tmp_path):
    from main_instance_segmentation import build_experiment, get_parameters

    cfg = get_parameters(TINY_OVERRIDES + [
        f"general.save_dir={tmp_path}/run",
    ])
    exp = build_experiment(cfg)
    example = exp._example_batch()
    state = exp.trainer.init_state(example)
    exp.evaluate(state, exp.test_dataset, save_for_freemask=True, max_scenes=1)
    files = os.listdir(f"{tmp_path}/run/freemasks")
    assert any(f.endswith("_cloud.npy") for f in files)
    assert any(f.endswith("_masks.npy") for f in files)
