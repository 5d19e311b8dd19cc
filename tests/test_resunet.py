"""MinkUNet / sparse ResNet family smoke + k3s2 map correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from unscene3d_tpu.ops import conv_ops
from unscene3d_tpu.ops.kernel_maps import KERNEL3_OFFSETS, build_sparse_graph
from unscene3d_tpu.models.resunet import MinkUNetBase, ResNet14, ResUNet14

rng = np.random.RandomState(0)


def coords_set(n=500, extent=20, seed=3):
    r = np.random.RandomState(seed)
    return np.unique(np.column_stack([
        r.randint(0, 2, 4 * n), r.randint(-extent, extent, (4 * n, 3))
    ]), axis=0)[:n].astype(np.int32)


def test_down_nbr_map_oracle():
    coords = coords_set()
    g = build_sparse_graph(coords, num_levels=3, build_down_nbr_maps=True)
    fine, coarse = g.levels[0], g.levels[1]
    lut = {tuple(c): i for i, c in enumerate(coords)}
    cc = np.asarray(coarse.coords)
    nv = int(coarse.valid.sum())
    d_idx = np.asarray(coarse.down_nbr_idx)
    d_val = np.asarray(coarse.down_nbr_valid)
    for j in range(0, nv, 7):
        for k in (0, 13, 26):
            q = (cc[j, 0], *(cc[j, 1:] * 2 + KERNEL3_OFFSETS[k]))
            if q in lut:
                assert d_val[k, j] and d_idx[k, j] == lut[q]
            else:
                assert not d_val[k, j]


def test_k3s2_conv_oracle():
    coords = coords_set(seed=4)
    g = build_sparse_graph(coords, num_levels=2, build_down_nbr_maps=True)
    fine, coarse = g.levels[0], g.levels[1]
    x = np.zeros((fine.num_padded, 6), np.float32)
    x[: len(coords)] = rng.randn(len(coords), 6)
    w = (rng.randn(27, 6, 5) * 0.2).astype(np.float32)
    out = np.asarray(conv_ops.sparse_conv3_down2(jnp.asarray(x), jnp.asarray(w), coarse))
    lut = {tuple(c): i for i, c in enumerate(coords)}
    cc = np.asarray(coarse.coords)
    for j in range(0, int(coarse.valid.sum()), 5):
        acc = np.zeros(5)
        for k, off in enumerate(KERNEL3_OFFSETS):
            q = (cc[j, 0], *(cc[j, 1:] * 2 + off))
            if q in lut:
                acc += x[lut[q]] @ w[k]
        np.testing.assert_allclose(out[j], acc, rtol=1e-4, atol=1e-5)


def test_minkunet_and_resnet_forward():
    coords = coords_set(n=800, extent=40, seed=5)
    g6 = build_sparse_graph(coords, num_levels=6, build_down_nbr_maps=True)
    feats = jnp.asarray(rng.randn(g6.levels[0].num_padded, 3).astype(np.float32))

    unet = ResUNet14(out_channels=4, init_dim=16,
                     planes=(16, 24, 32, 48, 32, 24, 24))
    v = unet.init(jax.random.PRNGKey(0), feats, g6)
    out = unet.apply(v, feats, g6, train=False)
    assert out.shape == (g6.levels[0].num_padded, 4)
    assert bool(jnp.isfinite(out).all())

    net = ResNet14(out_channels=4, init_dim=16, planes=(16, 24, 32, 48))
    v2 = net.init(jax.random.PRNGKey(0), feats, g6)
    out2 = net.apply(v2, feats, g6, train=False)
    assert out2.shape == (g6.levels[5].num_padded, 4)
    assert bool(jnp.isfinite(out2).all())


def test_remat_backbone_grads_match():
    """remat=True must be a pure memory optimization: identical loss and
    grads (to f32 reassociation noise) vs remat=False."""
    from unscene3d_tpu.models.backbone import Res16UNet14A

    coords = coords_set(n=600, extent=30, seed=7)
    g = build_sparse_graph(coords, num_levels=5, build_down_nbr_maps=True)
    feats = jnp.asarray(rng.randn(g.levels[0].num_padded, 3).astype(np.float32))

    kw = dict(out_channels=4, init_dim=8,
              planes=(8, 8, 16, 16, 16, 16, 8, 8))
    net0 = Res16UNet14A(**kw, remat=False)
    net1 = Res16UNet14A(**kw, remat=True)
    v = net0.init(jax.random.PRNGKey(0), feats, g)

    def loss(params, net):
        out, _, _ = net.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            feats, g, train=True, mutable=["batch_stats"])[0]
        return jnp.sum(out ** 2) / out.shape[0]

    l0, g0 = jax.value_and_grad(loss)(v["params"], net0)
    l1, g1 = jax.value_and_grad(loss)(v["params"], net1)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
