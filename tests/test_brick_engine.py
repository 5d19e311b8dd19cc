"""Brick-resident Pallas conv engine vs the gather-conv oracle.

The kernel runs in Pallas interpret mode on the CPU test mesh; on TPU it
compiles to Mosaic (exercised by bench/eval runs on hardware).
"""

import numpy as np
import jax.numpy as jnp

from unscene3d_tpu.data.collate import FreeMaskCollator
from unscene3d_tpu.data.synthetic import make_batch
from unscene3d_tpu.ops import brick_engine as be
from unscene3d_tpu.ops import conv_ops


def _setup(num_scenes=2, num_points=6000, C=16):
    batch, _ = FreeMaskCollator(voxel_size=0.05)(
        make_batch(num_scenes, num_points=num_points, seed=0))
    L0 = batch.graph.levels[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(L0.num_padded, C)), jnp.float32)
    x = x * L0.valid[:, None]
    bg = be.build_brick_graph(np.asarray(L0.coords), np.asarray(L0.valid))
    return L0, bg, x, rng


def test_brick_conv3_matches_gather():
    L0, bg, x, rng = _setup()
    C, Co = x.shape[-1], 24
    w = jnp.asarray(rng.normal(size=(27, C, Co)) * 0.1, jnp.float32)
    g = be.assemble(x, bg)
    y = be.disassemble(be.brick_conv3(g, w, bg), bg, L0)
    ref = conv_ops.sparse_conv3(x, w, L0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_halo_exchange_enables_second_conv():
    L0, bg, x, rng = _setup()
    C, Co = x.shape[-1], 24
    w1 = jnp.asarray(rng.normal(size=(27, C, Co)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(27, Co, C)) * 0.1, jnp.float32)
    g = be.assemble(x, bg)
    g1 = be.brick_conv3(g, w1, bg)
    g1 = be.halo_exchange(g1, bg)
    y2 = be.disassemble(be.brick_conv3(g1, w2, bg), bg, L0)
    ref = conv_ops.sparse_conv3(conv_ops.sparse_conv3(x, w1, L0), w2, L0)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_brick_conv3_fused_affine_residual_relu():
    L0, bg, x, rng = _setup()
    C, Co = x.shape[-1], 24
    w = jnp.asarray(rng.normal(size=(27, C, Co)) * 0.1, jnp.float32)
    sc = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    of = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    res_flat = jnp.asarray(rng.normal(size=(L0.num_padded, Co)), jnp.float32)
    res_flat = res_flat * L0.valid[:, None]
    res = be.assemble(res_flat, bg)
    g = be.assemble(x, bg)
    y = be.disassemble(
        be.brick_conv3(g, w, bg, scale=sc, offset=of, residual=res, relu=True),
        bg, L0)
    ref = conv_ops.sparse_conv3(x, w, L0)
    ref = jnp.maximum(ref * sc + of + res_flat, 0.0) * L0.valid[:, None]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_brick_conv1():
    L0, bg, x, rng = _setup()
    C, Co = x.shape[-1], 8
    w = jnp.asarray(rng.normal(size=(C, Co)) * 0.1, jnp.float32)
    g = be.assemble(x, bg)
    y = be.disassemble(be.brick_conv1(g, w, bg), bg, L0)
    ref = conv_ops.sparse_conv1(x, w, L0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
