"""Self-training round orchestration: train -> export -> merge -> retrain.

Exercises the filesystem contract between rounds (reference
scripts/mask3d_DINO_CSC_self_train.sh + trainer/trainer.py:743-760 +
datasets/freemask_semseg.py:224-265) end-to-end on a tiny synthetic dataset.
"""

import os

import numpy as np
import pytest

from tests.test_datasets import write_mask3d_dataset


@pytest.fixture(scope="module")
def tiny_cfg_overrides():
    return [
        "data.batch_size=2",
        "data.voxel_size=0.12",
        "model.hidden_dim=32",
        "model.num_queries=8",
        "model.num_heads=2",
        "model.dim_feedforward=64",
        "model.num_decoders=1",
        "model.sample_sizes=[16,32,64,128,256]",
        "model.backbone._target_=unscene3d_tpu.models.backbone.Res16UNet14A",
        "trainer.max_epochs=1",
        "trainer.check_val_every_n_epoch=5",
    ]


def test_round_cycle(tmp_path, tiny_cfg_overrides):
    from main_instance_segmentation import build_experiment, get_parameters

    data_dir = tmp_path / "data"
    write_mask3d_dataset(str(data_dir), n_scenes=2)

    # round 1: train briefly + export predictions in freemask format
    cfg = get_parameters(tiny_cfg_overrides + [
        f"general.data_dir={data_dir}",
        f"general.save_dir={tmp_path}/round1",
        "data/datasets=freemask",
    ])
    exp = build_experiment(cfg)
    state = exp.fit(max_epochs=1)
    exp.evaluate(state, exp.test_dataset, save_for_freemask=True)

    exported = sorted(os.listdir(f"{tmp_path}/round1/freemasks"))
    assert any(f.endswith("_cloud.npy") for f in exported)
    assert any(f.endswith("_masks.npy") for f in exported)

    # exported masks are full-resolution boolean matrices
    masks = np.load(f"{tmp_path}/round1/freemasks/{exported[-1]}")
    cloud = np.load(f"{tmp_path}/round1/freemasks/{exported[0]}")
    assert masks.dtype == bool and masks.shape[0] == cloud.shape[0]

    # round 2: dataset merges the exported predictions.
    # NOTE: the merge looks up freemasks/scene{stem}_... (stem of the npy);
    # exported names come from raw_filepath's parent dir.
    from unscene3d_tpu.data.freemask_dataset import FreeMaskDataset

    ds2 = FreeMaskDataset(
        data_dir=str(data_dir), mode="train", augment=False,
        load_self_train_data=True,
        self_train_data_dir=f"{tmp_path}/round1",
        num_self_train_data=5,
    )
    scene = ds2[0]
    assert scene["masks"].shape[1] >= 1  # dataset still loads masks

    # round 2 training consumes the merged dataset without error
    cfg2 = get_parameters(tiny_cfg_overrides + [
        f"general.data_dir={data_dir}",
        f"general.save_dir={tmp_path}/round2",
        "data/datasets=freemask",
        "optimizer=adamw_lower",
        f"data.datasets.train_dataset.load_self_train_data=true",
        f"data.datasets.train_dataset.self_train_data_dir={tmp_path}/round1",
        f"general.checkpoint={tmp_path}/round1/checkpoints",
    ])
    exp2 = build_experiment(cfg2)
    state2 = exp2.fit(max_epochs=1)
    assert int(state2.step) >= 1
