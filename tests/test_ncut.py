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
    # the exact eigh solver is bitwise batch-invariant; the fast subspace
    # solver is only deterministic per batch shape (degenerate tau-graph
    # spectra make the Fiedler direction ill-posed, so rounding differences
    # between batched/unbatched matmuls can pick different valid vectors)
    cfg = NCutConfig(affinity_tau=0.8, min_segment_size=2,
                     max_number_of_instances=6, solver="eigh")
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


def test_subspace_solver_quality():
    """Both eigensolvers must produce cluster-pure masks on well-separated
    scenes. Exact mask equality is NOT required: the binarized tau-graph has
    disconnected components, so the Fiedler direction is degenerate and any
    vector in the near-null subspace is a valid solution (the reference's
    LAPACK pick is equally arbitrary there)."""
    feats, uniq, conn, seg_ids, coords = clustered_scene(seed=3)
    kw = dict(affinity_tau=0.8, min_segment_size=2, max_number_of_instances=6)
    for solver in ("eigh", "subspace"):
        masks = generate_scene_masks(feats, uniq, conn, seg_ids, coords,
                                     NCutConfig(solver=solver, **kw))
        assert masks.shape[0] >= 2
        for m in masks:
            ids = np.nonzero(m)[0]
            assert len(set(ids // 6)) == 1, f"{solver}: mask spans clusters {ids}"
        assert (masks.sum(0) <= 1).all()


def test_padding_invariance():
    """A scene's masks must not depend on batch composition (padding size) --
    min/max normalization is restricted to valid entries (ADVICE round 1)."""
    feats, uniq, conn, seg_ids, coords = clustered_scene(seed=5)
    small = dict(features=feats[:6] + 0.0, unique_segments=np.arange(6),
                 connectivity=np.array([[0, 1], [1, 0]]),
                 segment_ids=np.repeat(np.arange(6), 5),
                 coords=np.random.RandomState(0).rand(30, 3).astype(np.float32))
    scene = dict(features=feats, unique_segments=uniq, connectivity=conn,
                 segment_ids=seg_ids, coords=coords)
    cfg = NCutConfig(affinity_tau=0.8, min_segment_size=2,
                     max_number_of_instances=6, solver="eigh")
    alone = BatchedNCut(cfg).run([scene])[0]
    # batched with a much smaller scene -> scene gets padded heavily
    padded = BatchedNCut(cfg).run([scene, small])[0]
    assert alone.shape == padded.shape
    assert (alone == padded).all()


def test_multimodal_normalization_no_rowwise():
    """Multimodal affinity uses normalize_mat only (reference
    get_affinity_matrix:99-112) -- check the two-modality path still
    produces valid masks and differs from accidentally row-normalized input."""
    feats, uniq, conn, seg_ids, coords = clustered_scene(seed=7)
    masks = generate_scene_masks((feats, feats + 0.01), uniq, conn, seg_ids,
                                 coords, NCutConfig(affinity_tau=0.8,
                                                    min_segment_size=2,
                                                    max_number_of_instances=6))
    assert masks.shape[1] == len(uniq)
    assert masks.shape[0] >= 2


def test_device_loop_matches_host_loop():
    """The device-resident greedy loop (NCutConfig.device_loop) must produce
    the same masks as the per-iteration host loop."""
    import dataclasses

    from unscene3d_tpu.pseudo.ncut import BatchedNCut, NCutConfig

    r = np.random.RandomState(0)
    scenes = []
    for i in range(4):
        s = 40 + 7 * i
        feats = r.randn(s, 16).astype(np.float32)
        uniq = np.arange(s)
        conn = np.column_stack([np.arange(s - 1), np.arange(1, s)])
        conn = np.vstack([conn, conn[:, ::-1]])
        seg_ids = np.repeat(uniq, 3)
        coords = r.rand(len(seg_ids), 3).astype(np.float32) * 5
        scenes.append(dict(features=feats, unique_segments=uniq,
                           connectivity=conn, segment_ids=seg_ids,
                           coords=coords))
    for mode in ("max", "avg", "largest"):
        cfg_d = NCutConfig(device_loop=True, separation_mode=mode,
                           solver="eigh")
        cfg_h = dataclasses.replace(cfg_d, device_loop=False)
        got = BatchedNCut(cfg_d).run([dict(x) for x in scenes])
        want = BatchedNCut(cfg_h).run([dict(x) for x in scenes])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w, err_msg=f"mode={mode}")
