"""Native C++ components vs numpy fallbacks."""

import numpy as np
import pytest

from unscene3d_tpu.native import (
    build_neighbor_map_native,
    load_native,
    segment_mesh,
    _segment_mesh_numpy,
)
from unscene3d_tpu.ops.kernel_maps import KERNEL3_OFFSETS, build_neighbor_map


def grid_mesh(nx=20, ny=20, seed=0, bumpy=True):
    """Height-field triangle mesh with two color regions."""
    r = np.random.RandomState(seed)
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    z = np.zeros((nx, ny))
    if bumpy:
        z[nx // 2:, :] = 2.0  # a step -> normal discontinuity
    verts = np.column_stack([
        xs.ravel() * 0.1, ys.ravel() * 0.1, z.ravel() * 0.1
    ]).astype(np.float32)
    verts += r.normal(0, 0.001, verts.shape).astype(np.float32)
    colors = np.zeros((nx * ny, 3), np.float32)
    colors[:, 0] = (xs.ravel() < nx // 2).astype(np.float32)
    colors[:, 1] = 1.0 - colors[:, 0]
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            faces.append([a, a + 1, a + ny])
            faces.append([a + 1, a + ny + 1, a + ny])
    return verts, np.asarray(faces, np.int32), colors


@pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")
def test_segment_mesh_native_runs():
    verts, faces, colors = grid_mesh()
    comps, conn = segment_mesh(verts, faces, colors, kthr=0.01, seg_min_verts=5)
    assert len(comps) == len(verts)
    n_seg = comps.max() + 1
    assert 2 <= n_seg < len(verts) // 2
    # consecutive ids
    assert set(np.unique(comps)) == set(range(n_seg))
    # connectivity references existing segments, no self-pairs
    if len(conn):
        assert conn.max() < n_seg
        assert (conn[:, 0] != conn[:, 1]).all()
    # color boundary should separate segments
    left = comps[np.nonzero(colors[:, 0] == 1)[0]]
    right = comps[np.nonzero(colors[:, 1] == 1)[0]]
    assert set(left.tolist()).isdisjoint(set(right.tolist()))


@pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")
def test_segment_mesh_native_matches_numpy():
    verts, faces, colors = grid_mesh(12, 12, seed=3)
    c1, p1 = segment_mesh(verts, faces, colors, kthr=0.02, seg_min_verts=4)
    c2, p2 = _segment_mesh_numpy(verts, faces, colors, 0.02, 4)
    # identical partitions (label values may differ only by permutation --
    # but both relabel in sorted-root order over the same union history)
    assert (c1 == c2).all()
    assert (p1 == p2).all()


@pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")
@pytest.mark.parametrize("shuffled", [False, True])
def test_neighbor_map_native_matches_numpy(shuffled):
    """Sorted input exercises the two-pointer merge path; shuffled input the
    flat-hash fallback. Both must equal the numpy searchsorted oracle."""
    r = np.random.RandomState(0)
    coords = np.unique(np.column_stack([
        r.randint(0, 3, 3000), r.randint(-30, 30, (3000, 3))
    ]), axis=0).astype(np.int32)
    if shuffled:
        coords = coords[r.permutation(len(coords))]
    res = build_neighbor_map_native(coords, KERNEL3_OFFSETS)
    assert res is not None
    idx_c, valid_c = res
    idx_np, valid_np = build_neighbor_map(coords, use_native=False)
    assert (valid_c == valid_np).all()
    assert (idx_c[valid_c] == idx_np[valid_np]).all()


@pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")
def test_fps_native_bit_identical():
    """C++ FPS must equal the numpy loop (which seeds the model's queries
    bit-identically to the device loop) on every index, ties included."""
    from unscene3d_tpu.native import furthest_point_sample_native

    r = np.random.RandomState(1)
    n = 20_000
    xyz = (r.randn(n, 3) * 3).astype(np.float32)
    # duplicated points force distance ties -> first-max tie-breaking matters
    xyz[n // 2:n // 2 + 500] = xyz[:500]
    valid = np.ones(n, bool)
    valid[-2048:] = False
    xyz[~valid] = 0.0
    got = furthest_point_sample_native(xyz, valid, 100)
    assert got is not None

    # inline numpy reference (same arithmetic as data/collate.py::fps_numpy)
    mask_bias = np.where(valid, np.float32(0), -np.inf).astype(np.float32)
    dist = np.full(n, np.inf, np.float32)
    idxs = np.zeros(100, np.int32)
    buf = np.empty((n, 3), np.float32)
    for i in range(1, 100):
        np.subtract(xyz, xyz[idxs[i - 1]], out=buf)
        np.multiply(buf, buf, out=buf)
        d = buf.sum(axis=1)
        np.minimum(dist, d, out=dist)
        idxs[i] = np.argmax(dist + mask_bias)
    np.testing.assert_array_equal(got, idxs)


@pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")
@pytest.mark.parametrize("w_sub,w_union", [(384, 4096), (256, 512)])
def test_win_graph_native_bit_identical(monkeypatch, w_sub, w_union):
    """build_win_graph's C++ passes must reproduce the numpy formulation
    field-for-field, including heavy spilling (w_union=512)."""
    import unscene3d_tpu.native as nat
    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops.window_conv import build_win_graph

    scene = make_scene(num_points=12_000, num_objects=4, extent=3.0, seed=3)
    batch, _ = FreeMaskCollator(voxel_size=0.02)([scene])
    level = batch.graph.levels[0]
    n_pad = level.num_padded
    nbr = np.asarray(level.nbr_idx)
    kw = dict(w_sub=min(w_sub, n_pad), w_union=min(w_union, n_pad))
    g_nat = build_win_graph(nbr, n_pad, **kw)
    monkeypatch.setattr(nat, "win_tables_native", lambda *a: None)
    monkeypatch.setattr(nat, "win_fill_lidx_native", lambda *a: None)
    g_np = build_win_graph(nbr, n_pad, **kw)
    for f in ("r0", "starts", "lidx", "spill_out", "spill_in", "spill_k",
              "spill_rows", "sp_q0", "sp_qn"):
        np.testing.assert_array_equal(np.asarray(getattr(g_nat, f)),
                                      np.asarray(getattr(g_np, f)), err_msg=f)
    assert g_nat.spill_q == g_np.spill_q


@pytest.mark.parametrize("shuffled", [False, True])
def test_neighbor_map_padded_matches_pad2(shuffled):
    """build_neighbor_map_padded (native fused sentinel layout, plus its
    numpy fallback) must equal the unpadded map + the masked pad2 sentinel
    pass it replaces (ops/kernel_maps.py::_pad_level)."""
    import unscene3d_tpu.native as nat
    from unscene3d_tpu.ops.kernel_maps import (
        build_neighbor_map,
        build_neighbor_map_padded,
    )

    rng = np.random.default_rng(11)
    coords = np.unique(np.concatenate(
        [np.zeros((800, 1), np.int64), rng.integers(0, 30, (800, 3))], 1),
        axis=0).astype(np.int32)
    if shuffled:
        coords = coords[rng.permutation(len(coords))]
    n, n_pad = len(coords), ((len(coords) // 128) + 2) * 128
    idx, val = build_neighbor_map(coords, use_native=False)
    ref = np.empty((27, n_pad), np.int32)
    ref[:, n:] = n_pad - 1
    ref[:, :n] = np.where(val, idx, n_pad - 1)
    got = build_neighbor_map_padded(coords, n_pad)
    np.testing.assert_array_equal(ref, got)
    # numpy fallback path too
    orig = nat.build_neighbor_map_padded_native
    try:
        nat.build_neighbor_map_padded_native = lambda *a: None
        got_np = build_neighbor_map_padded(coords, n_pad)
    finally:
        nat.build_neighbor_map_padded_native = orig
    np.testing.assert_array_equal(ref, got_np)


def test_sparse_graph_child_maps_match_downsample_scatter():
    """The parent-scatter child build in build_sparse_graph must equal
    build_downsample_map's child arrays + the pad2 sentinel pass."""
    from unscene3d_tpu.ops.kernel_maps import (
        build_downsample_map,
        build_sparse_graph,
    )

    rng = np.random.default_rng(5)
    coords = np.unique(np.concatenate(
        [rng.integers(0, 2, (2000, 1)), rng.integers(0, 50, (2000, 3))], 1),
        axis=0)
    g = build_sparse_graph(coords, num_levels=3)
    fine = coords
    for li in range(1, 3):
        coarse, p_idx, p_off, c_idx, c_valid = build_downsample_map(fine)
        n, n_pad = len(coarse), g.levels[li].num_padded
        fill = g.levels[li - 1].num_padded - 1
        ref = np.empty((8, n_pad), np.int32)
        ref[:, n:] = fill
        ref[:, :n] = np.where(c_valid, c_idx, fill)
        np.testing.assert_array_equal(
            ref, np.asarray(g.levels[li].child_idx), err_msg=f"level {li}")
        fine = coarse.astype(np.int64)
