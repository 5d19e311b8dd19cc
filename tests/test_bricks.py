"""Dense-brick conv must match the neighbor-gather conv bit-for-bit-ish."""

import numpy as np
import jax
import jax.numpy as jnp

from unscene3d_tpu.ops import conv_ops
from unscene3d_tpu.ops.bricks import brick_conv3, build_brick_map
from unscene3d_tpu.ops.kernel_maps import build_sparse_graph

rng = np.random.RandomState(0)


def make_graphs(n=600, extent=25, seed=1):
    r = np.random.RandomState(seed)
    coords = np.unique(np.column_stack([
        r.randint(0, 2, 4 * n), r.randint(-extent, extent, (4 * n, 3))
    ]), axis=0)[:n].astype(np.int32)
    g_plain = build_sparse_graph(coords, num_levels=2)
    g_brick = build_sparse_graph(coords, num_levels=2, brick_levels=(0,))
    return coords, g_plain, g_brick


def test_brick_conv_matches_gather_conv():
    coords, g_plain, g_brick = make_graphs()
    n_pad = g_plain.levels[0].num_padded
    assert g_brick.levels[0].num_padded == n_pad
    x = np.zeros((n_pad, 8), np.float32)
    x[: len(coords)] = rng.randn(len(coords), 8)
    w = (rng.randn(27, 8, 16) * 0.2).astype(np.float32)
    ref = np.asarray(conv_ops.sparse_conv3(jnp.asarray(x), jnp.asarray(w),
                                           g_plain.levels[0]))
    out = np.asarray(conv_ops.sparse_conv3(jnp.asarray(x), jnp.asarray(w),
                                           g_brick.levels[0]))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # nbr map is stubbed away at brick levels
    assert g_brick.levels[0].nbr_idx.shape == (27, 1)


def test_brick_map_structure():
    coords, _, g_brick = make_graphs(seed=2)
    bm = g_brick.levels[0].brick
    n_pad = g_brick.levels[0].num_padded
    asm = np.asarray(bm.assemble_idx)
    assert asm.shape[1:] == (10, 10, 10)
    assert asm.max() < n_pad
    # every real voxel has a unique output cell
    out_idx = np.asarray(bm.out_idx)[: len(coords)]
    assert len(np.unique(out_idx)) == len(coords)
    # center cells of assembled bricks contain each voxel exactly once
    centers = asm[:, 1:-1, 1:-1, 1:-1].reshape(-1)
    real = centers[centers != n_pad - 1]
    assert len(np.unique(real)) == len(coords)
