import numpy as np

from unscene3d_tpu.eval.box_eval import box3d_iou_aabb, boxes_from_masks, eval_det
from unscene3d_tpu.pseudo.freemask_query import cosine_sim, freemask_query_masks


def test_box_iou():
    a = np.array([0, 0, 0, 2, 2, 2], np.float64)
    assert box3d_iou_aabb(a, a) == 1.0
    b = np.array([1, 0, 0, 2, 2, 2], np.float64)
    assert abs(box3d_iou_aabb(a, b) - (4 / 12)) < 1e-9
    c = np.array([10, 0, 0, 2, 2, 2], np.float64)
    assert box3d_iou_aabb(a, c) == 0.0


def test_eval_det_perfect_and_fp():
    gt = {"s0": [(1, np.array([0, 0, 0, 2, 2, 2.0])),
                 (1, np.array([5, 5, 5, 2, 2, 2.0]))]}
    pred = {"s0": [(1, np.array([0, 0, 0, 2, 2, 2.0]), 0.9),
                   (1, np.array([5, 5, 5, 2, 2, 2.0]), 0.8)]}
    rec, ap = eval_det(pred, gt)
    assert ap[1] == 1.0 and rec[1] == 1.0
    pred["s0"].append((1, np.array([20, 0, 0, 2, 2, 2.0]), 0.95))  # top-scored FP
    rec, ap = eval_det(pred, gt)
    assert ap[1] < 1.0


def test_boxes_from_masks():
    coords = np.array([[0, 0, 0], [2, 0, 0], [1, 1, 1]], np.float64)
    masks = np.array([[1, 0], [1, 0], [0, 1]])
    out = boxes_from_masks(coords, masks, np.array([1, 1]), np.array([0.5, 0.6]))
    assert len(out) == 2
    cls, box, score = out[0]
    np.testing.assert_allclose(box[:3], [1, 0, 0])
    np.testing.assert_allclose(box[3:], [2, 0, 0])


def test_freemask_query_pipeline():
    r = np.random.RandomState(0)
    # two feature clusters of segments, chain-connected within each
    s = 16
    feats = np.zeros((s, 6), np.float32)
    feats[:8, 0] = 10 + r.rand(8)
    feats[8:, 1] = 10 + r.rand(8)
    uniq = np.arange(s)
    conn = np.array([[i, i + 1] for i in range(7)] +
                    [[i + 1, i] for i in range(7)] +
                    [[i, i + 1] for i in range(8, 15)] +
                    [[i + 1, i] for i in range(8, 15)])
    coords = np.zeros((s, 3), np.float32)
    coords[:, 0] = np.arange(s) * 0.1
    masks, scores = freemask_query_masks(
        feats, uniq, conn, coords, scene_extent=np.array([10.0, 10.0, 2.0]),
        nms_maskness_threshold=0.1, min_segments=2,
    )
    assert len(masks) >= 2
    for m in masks[:2]:
        ids = np.nonzero(m)[0]
        assert set(ids // 8) == {ids[0] // 8}  # stays within one cluster
    s_norm = cosine_sim(feats, feats)
    assert s_norm.min() >= 0 and s_norm.max() <= 1.0 + 1e-6
