"""AP evaluator + post-processing tests."""

import numpy as np

from unscene3d_tpu.eval.instance_eval import evaluate_instances
from unscene3d_tpu.eval.postprocess import (
    filter_out_instances,
    get_mask_and_scores,
    separate_segments,
)


def make_gt(n_points=3000, n_inst=5, seed=0):
    r = np.random.RandomState(seed)
    gt = np.zeros(n_points, np.int64)
    size = n_points // (n_inst + 2)
    for k in range(n_inst):
        gt[k * size:(k + 1) * size] = 1000 + k + 1  # sem=1, inst=k
    # rest: some void (sem 0)
    return gt


def test_perfect_predictions_ap1():
    gt = make_gt()
    inst_ids = np.unique(gt[gt > 0])
    masks = np.stack([gt == i for i in inst_ids], axis=1)
    preds = {"scene0": {
        "masks": masks,
        "classes": np.ones(len(inst_ids), np.int64),
        "scores": np.linspace(0.9, 0.99, len(inst_ids)),
    }}
    res = evaluate_instances(preds, {"scene0": gt}, min_region_size=10)
    assert abs(res["all_ap_50%"] - 1.0) < 1e-6
    assert abs(res["all_ap"] - 1.0) < 1e-6
    assert abs(res["classes"]["foreground"]["ap25%"] - 1.0) < 1e-6


def test_half_wrong_predictions():
    gt = make_gt(n_inst=4)
    inst_ids = np.unique(gt[gt > 0])
    masks = np.stack([gt == i for i in inst_ids], axis=1)
    # corrupt half the predictions: empty region (no overlap with anything valid)
    masks[:, 2:] = False
    masks[-10:, 2:] = True  # tiny masks in void region
    preds = {"scene0": {
        "masks": masks,
        "classes": np.ones(len(inst_ids), np.int64),
        "scores": np.full(len(inst_ids), 0.9),
    }}
    res = evaluate_instances(preds, {"scene0": gt}, min_region_size=10)
    # 2 of 4 gts found -> recall caps at 0.5; precision 1 while they last
    assert 0.2 < res["all_ap_50%"] <= 0.55


def test_missed_gt_reduces_ap():
    gt = make_gt(n_inst=4)
    inst_ids = np.unique(gt[gt > 0])
    masks = np.stack([gt == i for i in inst_ids[:2]], axis=1)
    preds = {"scene0": {
        "masks": masks,
        "classes": np.ones(2, np.int64),
        "scores": np.array([0.9, 0.8]),
    }}
    res = evaluate_instances(preds, {"scene0": gt}, min_region_size=10)
    assert res["all_ap_50%"] < 0.75


def test_get_mask_and_scores_topk():
    r = np.random.RandomState(0)
    probs = r.rand(6, 2)
    mask_pred = r.randn(50, 6)
    scores, masks, classes, heatmap = get_mask_and_scores(probs, mask_pred)
    assert masks.shape == (50, 6) and len(scores) == 6
    # sorted by class prob descending before mask weighting
    flat = probs.reshape(-1)
    top = np.argsort(-flat)[:6]
    assert (classes == top % 2).all()
    assert ((masks == 1) == (mask_pred[:, top // 2] > 0)).all()


def test_filter_out_instances_dedups():
    m = np.zeros((30, 3), np.float32)
    m[:10, 0] = 1
    m[:10, 1] = 1  # duplicate of 0
    m[15:25, 2] = 1
    keep = filter_out_instances(m, np.array([0.9, 0.8, 0.7]), iou_threshold=0.9)
    assert keep == [0, 2]


def test_separate_segments_components():
    uniq = np.arange(6)
    fg = np.array([True, True, False, True, True, False])
    conn = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
    comps = separate_segments(fg, uniq, conn)
    comps = sorted([sorted(c.tolist()) for c in comps])
    assert comps == [[0, 1], [3, 4]]


def test_packed_eval_matches_host_path():
    """Device-side post-processing (bit-packed masks + on-device scoring)
    must reproduce the host path exactly."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.eval.postprocess import (
        eval_scene_predictions, eval_scene_predictions_packed)

    rng = np.random.RandomState(0)
    n_pad, n_vox, q, c = 512, 477, 10, 3
    logits = rng.randn(q, c).astype(np.float32) * 2
    vox = rng.randn(n_pad, q).astype(np.float32)
    valid = np.zeros(n_pad, bool)
    valid[:n_vox] = True
    inverse_map = rng.randint(0, n_vox, 1500)
    p2s = rng.randint(0, 40, 1500)
    conn = np.column_stack([np.arange(39), np.arange(1, 40)])

    kwargs = dict(inverse_map=inverse_map, point2segment_full=p2s,
                  eval_on_segments=True, topk_per_image=-1,
                  filter_instances=True, iou_threshold=0.9,
                  scores_threshold=0.01, separate_instances=False,
                  segment_connectivity=conn)
    want = eval_scene_predictions(logits, vox[:n_vox], **kwargs)

    # replicate the device math (train/loop.py::build_eval_step_device_post)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    binary = (vox > 0) & valid[:, None]
    heat = 1 / (1 + np.exp(-vox))
    mask_scores = (heat * binary).sum(0) / (binary.sum(0) + 1e-6)
    packed = np.packbits(binary, axis=0)

    got = eval_scene_predictions_packed(probs, mask_scores, packed, n_vox,
                                        **kwargs)
    np.testing.assert_array_equal(got["masks"], want["masks"])
    np.testing.assert_array_equal(got["classes"], want["classes"])
    np.testing.assert_allclose(got["scores"], want["scores"], rtol=1e-5)

    # connectivity separation branch of the segment-space tail
    kwargs["separate_instances"] = True
    want = eval_scene_predictions(logits, vox[:n_vox], **kwargs)
    got = eval_scene_predictions_packed(probs, mask_scores, packed, n_vox,
                                        **kwargs)
    np.testing.assert_array_equal(got["masks"], want["masks"])
    np.testing.assert_array_equal(got["classes"], want["classes"])
    np.testing.assert_allclose(got["scores"], want["scores"], rtol=1e-5)
