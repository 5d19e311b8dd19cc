"""NCut pseudo-mask generation on constructed cases."""

import numpy as np

from unscene3d_tpu.pseudo.features import aggregate_features
from unscene3d_tpu.pseudo.ncut import BatchedNCut, NCutConfig, generate_scene_masks


def clustered_scene(n_clusters=3, segs_per_cluster=6, seed=0):
    """Segments whose features form tight, well-separated clusters; chain
    connectivity within each cluster."""
    r = np.random.RandomState(seed)
    s = n_clusters * segs_per_cluster
    centers = np.eye(n_clusters, 8) * 10
    feats = np.vstack([
        centers[c] + r.normal(0, 0.05, (segs_per_cluster, 8))
        for c in range(n_clusters)
    ]).astype(np.float32)
    uniq = np.arange(s)
    conn = []
    for c in range(n_clusters):
        base = c * segs_per_cluster
        for i in range(segs_per_cluster - 1):
            conn.append([base + i, base + i + 1])
            conn.append([base + i + 1, base + i])
    conn = np.asarray(conn)
    # points: 5 per segment, clusters spatially separated
    seg_ids = np.repeat(uniq, 5)
    coords = np.zeros((len(seg_ids), 3), np.float32)
    coords[:, 0] = np.repeat(np.arange(s), 5) + r.rand(len(seg_ids)) * 0.1
    return feats, uniq, conn, seg_ids, coords


def test_ncut_recovers_clusters():
    feats, uniq, conn, seg_ids, coords = clustered_scene()
    cfg = NCutConfig(affinity_tau=0.8, min_segment_size=2, max_number_of_instances=6)
    masks = generate_scene_masks(feats, uniq, conn, seg_ids, coords, cfg)
    assert masks.shape[1] == len(uniq)
    assert masks.shape[0] >= 2  # finds at least 2 of the 3 clusters
    # each found mask is exactly one cluster
    for m in masks:
        ids = np.nonzero(m)[0]
        clusters = set(ids // 6)
        assert len(clusters) == 1, f"mask spans clusters: {ids}"
    # no overlaps between accepted masks
    assert (masks.sum(0) <= 1).all()


def test_ncut_tiny_scene_single_mask():
    feats = np.random.RandomState(0).rand(2, 4).astype(np.float32)
    uniq = np.arange(2)
    masks = generate_scene_masks(
        feats, uniq, np.zeros((0, 2), int), np.repeat(uniq, 3),
        np.random.rand(6, 3),
    )
    assert masks.shape == (1, 2) and masks.all()


def test_batched_matches_single():
    scenes = []
    for seed in range(3):
        feats, uniq, conn, seg_ids, coords = clustered_scene(seed=seed)
        scenes.append(dict(features=feats, unique_segments=uniq,
                           connectivity=conn, segment_ids=seg_ids, coords=coords))
    cfg = NCutConfig(affinity_tau=0.8, min_segment_size=2, max_number_of_instances=6)
    batched = BatchedNCut(cfg).run(scenes)
    for b, s in enumerate(scenes):
        single = generate_scene_masks(s["features"], s["unique_segments"],
                                      s["connectivity"], s["segment_ids"],
                                      s["coords"], cfg)
        assert batched[b].shape == single.shape
        assert (batched[b] == single).all()


def test_aggregate_features_infill():
    feats = np.zeros((9, 4), np.float32)
    feats[0:3] = 1.0   # segment 0 voxels
    feats[3:6] = 2.0   # segment 1 voxels
    # segment 2 voxels all zero -> infilled from neighbor segment 1
    seg_ids = np.repeat([10, 20, 30], 3)
    conn = np.array([[30, 20], [20, 30], [10, 20], [20, 10]])
    seg, uniq = aggregate_features(feats, seg_ids, conn)
    assert (uniq == [10, 20, 30]).all()
    np.testing.assert_allclose(seg[0], 1.0)
    np.testing.assert_allclose(seg[1], 2.0)
    np.testing.assert_allclose(seg[2], 2.0)  # from neighbor 20
