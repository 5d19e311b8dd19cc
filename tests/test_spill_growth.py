"""Spill-plan growth: an unlucky augmentation draw must grow the master pad
plan (one recompile) instead of crashing training mid-epoch (VERDICT r4
next#2). The spill counts are MAX statistics of a spiky distribution, so the
rebuilt plan must ratchet in the REALIZED requirement, not re-probe blind."""

import numpy as np
import pytest

from unscene3d_tpu.ops.window_conv import SpillPlanExceeded, build_win_graph

TINY_OVERRIDES = [
    "data/datasets=synthetic",
    "data.batch_size=2",
    "data.voxel_size=0.12",
    "data.win_levels=[0,1]",
    "data.datasets.train_dataset.num_scenes=4",
    "data.datasets.train_dataset.num_points=1500",
    "data.datasets.validation_dataset.num_scenes=1",
    "data.datasets.validation_dataset.num_points=1500",
    "data.datasets.test_dataset.num_scenes=1",
    "data.datasets.test_dataset.num_points=1500",
    "model.hidden_dim=32",
    "model.num_queries=8",
    "model.num_heads=2",
    "model.dim_feedforward=64",
    "model.num_decoders=1",
    "model.sample_sizes=[16,32,64,128,256]",
    "model.backbone._target_=unscene3d_tpu.models.backbone.Res16UNet14A",
    "trainer.max_epochs=1",
]


def _spilly_graph(n_pad=1024, tile=256):
    """A k3 neighbor map whose dx=+1 offsets sit FAR outside any 384-row
    region window, guaranteeing real spills."""
    r = np.random.RandomState(0)
    nbr = np.full((27, n_pad), n_pad - 1, np.int64)
    nbr[13] = np.arange(n_pad)
    # near neighbors for a dy offset
    nbr[16, : n_pad - 1] = np.arange(1, n_pad)
    # far neighbors for a dx=+1 offset on a sprinkling of rows
    rows = r.choice(n_pad // 2, size=40, replace=False)
    nbr[22, rows] = rows + n_pad // 2
    return nbr


def test_build_win_graph_raises_typed_with_realized_need():
    nbr = _spilly_graph()
    natural = build_win_graph(nbr, 1024, w_sub=384, w_union=512)
    assert natural.spill_q > 0 and natural.num_spill_padded > 0

    with pytest.raises(SpillPlanExceeded) as ei:
        build_win_graph(nbr, 1024, w_sub=384, w_union=512, spill_plan=(8, 8))
    p_need, q_need = ei.value.needed["win_spill"]
    assert p_need > 8 or q_need > 8
    # rebuilding with the realized requirement succeeds
    wg = build_win_graph(nbr, 1024, w_sub=384, w_union=512,
                         spill_plan=(p_need, q_need))
    assert wg.num_spill_padded == p_need and wg.spill_q == q_need


def test_build_sparse_graph_rekeys_level():
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops.kernel_maps import build_sparse_graph
    from unscene3d_tpu.ops.hashing import sparse_quantize

    scene = make_scene(num_points=20000, seed=0)
    vox, _, _ = sparse_quantize(scene["xyz"], 0.02)
    coords = np.column_stack([np.zeros(len(vox), np.int32), vox])
    # natural build first to learn the realized spill sizes
    g = build_sparse_graph(coords, win_levels=(0,), win_w_union=512)
    win = g.levels[0].win
    if win is None or win.spill_q == 0:
        pytest.skip("no spills realized on this topology")
    with pytest.raises(SpillPlanExceeded) as ei:
        build_sparse_graph(coords, win_levels=(0,), win_w_union=512,
                           win_spills=[[8, 8]] * 5)
    assert 0 in ei.value.needed["win_spill"]


def _tiny_experiment(tmp_path):
    from main_instance_segmentation import build_experiment, get_parameters

    cfg = get_parameters(TINY_OVERRIDES + [
        f"general.save_dir={tmp_path}/run",
        "general.experiment_name=spill_growth",
    ])
    return build_experiment(cfg)


def test_floors_ratchet_into_rebuilt_plan(tmp_path):
    exp = _tiny_experiment(tmp_path)
    plan0 = exp._pads()
    exc = SpillPlanExceeded("synthetic overflow",
                            needed={"win_spill": {0: (4096, 256)}})
    exp._note_pad_rebuild(exc)
    plan1 = exp._pads()
    # grown floor: spill_grow doubles + adds headroom, so the new entry must
    # dominate both the probe and the realized requirement
    assert plan1["win_spill"][0][0] >= 4096
    assert plan1["win_spill"][0][1] >= 256
    assert plan1["win_spill"][0][0] >= plan0["win_spill"][0][0]
    assert exp.pad_rebuilds == 1


def test_scene_and_target_overflows_ratchet(tmp_path):
    """Per-scene row / segment / target-count overflows (raw broadcast
    ValueErrors before r5) must raise ratchetable SpillPlanExceeded and be
    absorbed by the rebuild loop."""
    exp = _tiny_experiment(tmp_path)
    exp._pads()
    exp._master_pads = dict(exp._master_pads,
                            scene_n=[64] * 5, s_max=64, t_max=8)
    rng = np.random.RandomState(1)
    from unscene3d_tpu.train.experiment import _EpochSampler

    sampler = _EpochSampler(len(exp.train_dataset), rng)
    for _ in range(6):
        batch = exp._train_batch(sampler)
        assert batch is not None
    assert exp.pad_rebuilds >= 1
    # the rebuilt plan carries the ratcheted floors
    plan = exp._pads()
    assert plan["scene_n"][0] > 64 and plan["t_max"] > 8


def test_50_redraws_never_crash_and_growth_converges(tmp_path):
    """50 augmentation redraws of the same scenes under a probed plan: the
    retry loop must absorb any overflow by growing the plan; growth must
    converge (bounded rebuilds), and every batch must collate."""
    exp = _tiny_experiment(tmp_path)
    exp._pads()
    # sabotage the probed plan's spill entries to the minimum bucket so the
    # overflow path actually fires if ANY draw spills; growth must recover
    exp._master_pads = dict(exp._master_pads,
                            win_spill=[[8, 8]] * 5,
                            win_spill_down=[8] * 5,
                            win_spill_up=[8] * 5)
    rng = np.random.RandomState(0)
    from unscene3d_tpu.train.experiment import _EpochSampler

    sampler = _EpochSampler(len(exp.train_dataset), rng)
    n_ok = 0
    for _ in range(50):
        batch = exp._train_batch(sampler)
        assert batch is not None
        n_ok += 1
    assert n_ok == 50
    assert exp.pad_rebuilds <= 6, (
        f"plan growth did not converge: {exp.pad_rebuilds} rebuilds")
