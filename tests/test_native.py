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
def test_neighbor_map_native_matches_numpy():
    r = np.random.RandomState(0)
    coords = np.unique(np.column_stack([
        r.randint(0, 3, 3000), r.randint(-30, 30, (3000, 3))
    ]), axis=0).astype(np.int32)
    res = build_neighbor_map_native(coords, KERNEL3_OFFSETS)
    assert res is not None
    idx_c, valid_c = res
    idx_np, valid_np = build_neighbor_map(coords, use_native=False)
    assert (valid_c == valid_np).all()
    assert (idx_c[valid_c] == idx_np[valid_np]).all()
