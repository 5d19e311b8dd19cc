"""Unit tests for the sparse-conv engine against dense numpy oracles.

This is the kernel-equivalence layer the reference lacks (its nearest analog:
utils/pointops2/functions/test_*.py manual v1-vs-v2 comparisons, SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from unscene3d_tpu.ops.hashing import CoordHashTable, ravel_hash, sparse_quantize
from unscene3d_tpu.ops.kernel_maps import (
    KERNEL2_OFFSETS,
    KERNEL3_OFFSETS,
    build_downsample_map,
    build_neighbor_map,
    build_sparse_graph,
)
from unscene3d_tpu.ops import conv_ops
from unscene3d_tpu.ops.segment_ops import segment_max, segment_mean, segment_sum
from unscene3d_tpu.ops.sparse_graph import bucket_size

rng = np.random.RandomState(0)


def random_coords(n, batch=2, extent=12, seed=0):
    r = np.random.RandomState(seed)
    coords = np.unique(
        np.column_stack(
            [
                r.randint(0, batch, 4 * n),
                r.randint(-extent, extent, (4 * n, 3)),
            ]
        ),
        axis=0,
    )[:n]
    return coords.astype(np.int32)


def dense_from_sparse(coords, feats, extent):
    """Scatter sparse voxels into a dense (B, S, S, S, C) grid."""
    b = coords[:, 0].max() + 1
    size = 2 * extent + 2
    dense = np.zeros((b, size, size, size, feats.shape[1]), dtype=np.float64)
    occ = np.zeros((b, size, size, size), dtype=bool)
    sh = coords[:, 1:] + extent
    dense[coords[:, 0], sh[:, 0], sh[:, 1], sh[:, 2]] = feats
    occ[coords[:, 0], sh[:, 0], sh[:, 1], sh[:, 2]] = True
    return dense, occ


class TestHashing:
    def test_ravel_roundtrip_unique(self):
        coords = random_coords(500)
        keys = ravel_hash(coords)
        assert len(np.unique(keys)) == len(np.unique(coords, axis=0))

    def test_negative_coords(self):
        coords = np.array([[0, -5, -1, 3], [1, -5, -1, 3], [0, -5, -1, 3]])
        keys = ravel_hash(coords)
        assert keys[0] == keys[2] and keys[0] != keys[1]

    def test_hash_table_lookup(self):
        coords = random_coords(300, seed=3)
        table = CoordHashTable(coords)
        idx, found = table.lookup(coords)
        assert found.all()
        assert (coords[idx] == coords).all()
        missing = coords.copy()
        missing[:, 1] += 1000
        _, found = table.lookup(missing)
        assert not found.any()

    def test_sparse_quantize(self):
        pts = rng.randn(1000, 3) * 0.5
        vox, unique_map, inverse_map = sparse_quantize(pts, voxel_size=0.05)
        assert (np.floor(pts / 0.05).astype(np.int32) == vox[inverse_map]).all()
        # unique_map selects representatives mapping to their own voxel
        assert (inverse_map[unique_map] == np.arange(len(vox))).all()


class TestKernelMaps:
    def test_neighbor_map_oracle(self):
        coords = random_coords(400, seed=1)
        nbr_idx, nbr_valid = build_neighbor_map(coords)
        assert (nbr_idx[13] == np.arange(len(coords))).all()
        assert nbr_valid[13].all()
        lut = {tuple(c): i for i, c in enumerate(coords)}
        for k in [0, 5, 13, 20, 26]:
            off = KERNEL3_OFFSETS[k]
            for i in range(0, len(coords), 17):
                q = (coords[i][0], *(coords[i][1:] + off))
                if q in lut:
                    assert nbr_valid[k, i] and nbr_idx[k, i] == lut[q]
                else:
                    assert not nbr_valid[k, i]

    def test_downsample_map(self):
        coords = random_coords(400, seed=2)
        coarse, p_idx, p_off, c_idx, c_valid = build_downsample_map(coords)
        # every fine voxel's parent is floor(c/2)
        expect_parent = coords.copy()
        expect_parent[:, 1:] = np.floor_divide(expect_parent[:, 1:], 2)
        assert (coarse[p_idx] == expect_parent).all()
        # child table inverts the parent map
        n = len(coords)
        for i in range(n):
            assert c_valid[p_off[i], p_idx[i]]
            assert c_idx[p_off[i], p_idx[i]] == i
        # offsets consistent with KERNEL2_OFFSETS ordering
        rel = coords[:, 1:] - coarse[p_idx][:, 1:] * 2
        assert (KERNEL2_OFFSETS[p_off] == rel).all()

    def test_graph_levels_shrink(self):
        coords = random_coords(500, seed=4, extent=30)
        g = build_sparse_graph(coords, num_levels=5)
        counts = [int(l.valid.sum()) for l in g.levels]
        assert all(a >= b for a, b in zip(counts, counts[1:]))
        assert counts[0] == len(coords)


class TestSparseConv:
    def _setup(self, cin=8, cout=16, seed=5):
        coords = random_coords(300, seed=seed, extent=10)
        g = build_sparse_graph(coords, num_levels=2)
        n0 = g.levels[0].num_padded
        x = np.zeros((n0, cin), dtype=np.float32)
        x[: len(coords)] = rng.randn(len(coords), cin)
        return coords, g, x

    def test_conv3_dense_oracle(self):
        coords, g, x = self._setup()
        w = rng.randn(27, 8, 16).astype(np.float32) * 0.1
        out = np.array(conv_ops.sparse_conv3(jnp.array(x), jnp.array(w), g.levels[0]))
        n = len(coords)
        dense, occ = dense_from_sparse(coords, x[:n], extent=12)
        for i in range(0, n, 7):
            b, cx, cy, cz = coords[i]
            acc = np.zeros(16)
            for k, off in enumerate(KERNEL3_OFFSETS):
                q = coords[i][1:] + off + 12
                if occ[b, q[0], q[1], q[2]]:
                    acc += dense[b, q[0], q[1], q[2]] @ w[k]
            np.testing.assert_allclose(out[i], acc, rtol=1e-4, atol=1e-4)
        # padded rows are zero
        assert (out[n:] == 0).all()

    def test_down_up_oracle(self):
        coords, g, x = self._setup(seed=6)
        fine, coarse = g.levels[0], g.levels[1]
        wd = rng.randn(8, 8, 16).astype(np.float32) * 0.1
        down = np.array(conv_ops.sparse_conv_down2(jnp.array(x), jnp.array(wd), coarse))
        n = len(coords)
        nc = int(coarse.valid.sum())
        cc = np.array(coarse.coords[:nc])
        for j in range(0, nc, 5):
            acc = np.zeros(16)
            for i in range(n):
                if (coords[i][0] == cc[j][0]) and (
                    np.floor_divide(coords[i][1:], 2) == cc[j][1:]
                ).all():
                    off = coords[i][1:] - cc[j][1:] * 2
                    k = off[0] * 4 + off[1] * 2 + off[2]
                    acc += x[i] @ wd[k]
            np.testing.assert_allclose(down[j], acc, rtol=1e-4, atol=1e-4)

        # transposed conv: each fine voxel gets parent feature through its offset's weights
        xc = np.zeros((coarse.num_padded, 8), dtype=np.float32)
        xc[:nc] = rng.randn(nc, 8)
        wu = rng.randn(8, 8, 16).astype(np.float32) * 0.1
        up = np.array(conv_ops.sparse_conv_up2(jnp.array(xc), jnp.array(wu), fine))
        p_idx = np.array(fine.parent_idx[:n])
        p_off = np.array(fine.parent_offset[:n])
        for i in range(0, n, 7):
            np.testing.assert_allclose(
                up[i], xc[p_idx[i]] @ wu[p_off[i]], rtol=1e-4, atol=1e-4
            )

    def test_avg_max_pool(self):
        coords, g, x = self._setup(seed=7)
        coarse = g.levels[1]
        avg = np.array(conv_ops.avg_pool2(jnp.array(x), coarse))
        mx = np.array(conv_ops.max_pool2(jnp.array(x), coarse))
        nc = int(coarse.valid.sum())
        cc = np.array(coarse.coords[:nc])
        parents = coords.copy()
        parents[:, 1:] = np.floor_divide(parents[:, 1:], 2)
        for j in range(0, nc, 5):
            members = (parents == cc[j]).all(1)
            np.testing.assert_allclose(avg[j], x[: len(coords)][members].mean(0), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(mx[j], x[: len(coords)][members].max(0), rtol=1e-5, atol=1e-5)


class TestSegmentOps:
    def test_segment_reductions(self):
        ids = jnp.array([0, 1, 0, 2, 1, 0])
        data = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
        valid = jnp.array([True, True, True, True, True, False])
        s = segment_sum(data, ids, 4, valid)
        m = segment_mean(data, ids, 4, valid)
        mx = segment_max(data, ids, 4, valid)
        np.testing.assert_allclose(s[0], data[0] + data[2])
        np.testing.assert_allclose(s[3], [0, 0])  # empty segment
        np.testing.assert_allclose(m[1], (data[1] + data[4]) / 2)
        np.testing.assert_allclose(mx[0], np.maximum(data[0], data[2]))
        np.testing.assert_allclose(mx[3], [0, 0])


def test_bucket_size():
    assert bucket_size(1) == 256
    assert bucket_size(1000) >= 1000
    assert bucket_size(1000) % 128 == 0
    vals = sorted({bucket_size(n) for n in range(1, 200000, 997)})
    assert len(vals) < 30  # few distinct buckets => few recompiles
