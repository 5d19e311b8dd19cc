"""Point-op tests vs brute-force numpy, plus matrix NMS and FPS."""

import numpy as np
import jax.numpy as jnp

from unscene3d_tpu.eval.nms import matrix_nms
from unscene3d_tpu.ops.fps import furthest_point_sample
from unscene3d_tpu.ops.point_ops import (
    ball_query,
    build_trilinear_weights,
    group_points,
    knn_query,
    three_interpolate,
    three_nn,
    trilinear_interpolate,
)

rng = np.random.RandomState(0)


def test_knn_matches_numpy():
    q = rng.randn(50, 3).astype(np.float32)
    s = rng.randn(80, 3).astype(np.float32)
    idx, d = knn_query(jnp.asarray(q), jnp.asarray(s), 5)
    full = ((q[:, None] - s[None]) ** 2).sum(-1)
    ref = np.argsort(full, axis=1)[:, :5]
    np.testing.assert_allclose(np.sort(np.asarray(d), 1),
                               np.sort(np.take_along_axis(full, ref, 1), 1),
                               rtol=1e-4, atol=1e-4)
    # same neighbor sets
    assert all(set(np.asarray(idx)[i]) == set(ref[i]) for i in range(50))


def test_three_interpolate_exact_at_support():
    s = rng.randn(30, 3).astype(np.float32)
    f = rng.randn(30, 4).astype(np.float32)
    idx, d = three_nn(jnp.asarray(s), jnp.asarray(s))
    out = three_interpolate(jnp.asarray(f), idx, d)
    np.testing.assert_allclose(np.asarray(out), f, rtol=1e-3, atol=1e-4)


def test_ball_query_radius():
    q = np.zeros((1, 3), np.float32)
    s = np.array([[0.1, 0, 0], [0.5, 0, 0], [2.0, 0, 0]], np.float32)
    idx, mask = ball_query(jnp.asarray(q), jnp.asarray(s), radius=1.0, max_samples=4)
    m = np.asarray(mask)[0]
    assert m.sum() == 2
    assert set(np.asarray(idx)[0][m].tolist()) == {0, 1}
    g = group_points(jnp.asarray(s), idx)
    assert g.shape == (1, 4, 3)


def test_fps_spreads_points():
    pts = np.zeros((100, 3), np.float32)
    pts[:50, 0] = rng.rand(50) * 0.1          # cluster A
    pts[50:, 0] = 10 + rng.rand(50) * 0.1     # cluster B
    idx = np.asarray(furthest_point_sample(jnp.asarray(pts), jnp.ones(100, bool), 4))
    sides = pts[idx, 0] > 5
    assert sides.any() and (~sides).any()  # both clusters sampled


def test_trilinear_weights_partition_of_unity():
    q = rng.rand(20, 3).astype(np.float32) * 2
    corners, w = build_trilinear_weights(jnp.asarray(q), voxel_size=0.25)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
    # interpolation of a constant field is constant
    feats = np.full((100, 2), 3.5, np.float32)
    idx = rng.randint(0, 100, (20, 8))
    out = trilinear_interpolate(jnp.asarray(feats), jnp.asarray(idx),
                                jnp.ones((20, 8), bool), w)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)


def test_matrix_nms_suppresses_duplicates():
    masks = np.zeros((3, 100), bool)
    masks[0, :50] = True
    masks[1, :50] = True   # duplicate of 0
    masks[2, 60:90] = True
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    out = matrix_nms(masks, scores)
    assert out[0] == scores[0]          # top mask untouched
    assert out[1] < 0.15                # duplicate crushed
    assert out[2] > 0.65                # disjoint mask kept


def test_fps_host_precompute_matches_device():
    """collate.fps_numpy (host seeds) is bit-identical to the jit FPS loop."""
    import numpy as np
    from unscene3d_tpu.data.collate import fps_numpy
    from unscene3d_tpu.ops.fps import furthest_point_sample

    rng = np.random.RandomState(0)
    xyz = rng.randint(0, 400, size=(5000, 3)).astype(np.float32)
    valid = np.ones(5000, bool)
    valid[4200:] = False
    host = fps_numpy(xyz, valid, 64)
    dev = np.asarray(furthest_point_sample(jnp.asarray(xyz),
                                           jnp.asarray(valid), 64))
    np.testing.assert_array_equal(host, dev)


def test_collator_fps_idx_matches_model_path():
    """Collator-emitted fps_idx equals the in-model device FPS inputs."""
    import numpy as np
    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops.fps import furthest_point_sample_batch

    scenes = [make_scene(num_points=6_000, num_objects=3, extent=3.0, seed=s)
              for s in (0, 1)]
    batch, _ = FreeMaskCollator(voxel_size=0.02, fps_queries=16)(scenes)
    assert batch.fps_idx.shape == (2, 16)
    L0 = batch.graph.levels[0]
    vox_xyz = jnp.take(jnp.asarray(L0.coords[:, 1:], jnp.float32),
                       jnp.asarray(batch.scene_idx[0]), axis=0)
    dev = furthest_point_sample_batch(vox_xyz,
                                      jnp.asarray(batch.scene_valid[0]), 16)
    np.testing.assert_array_equal(np.asarray(batch.fps_idx), np.asarray(dev))
