"""Custom scatter-free conv VJPs must equal XLA autodiff gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from unscene3d_tpu.ops import conv_ops
from unscene3d_tpu.ops.kernel_maps import build_sparse_graph

rng = np.random.RandomState(0)


def setup(n=400, extent=12, seed=1):
    r = np.random.RandomState(seed)
    coords = np.unique(np.column_stack([
        r.randint(0, 2, 4 * n), r.randint(-extent, extent, (4 * n, 3))
    ]), axis=0)[:n].astype(np.int32)
    g = build_sparse_graph(coords, num_levels=2)
    fine, coarse = g.levels[0], g.levels[1]
    x = np.zeros((fine.num_padded, 6), np.float32)
    x[: len(coords)] = r.randn(len(coords), 6)
    return fine, coarse, jnp.asarray(x), len(coords)


def check_grads(custom_fn, ref_fn, args, wrt=(0, 1)):
    for i in wrt:
        g_custom = jax.grad(lambda *a: custom_fn(*a).astype(jnp.float32).sum(),
                            argnums=i)(*args)
        g_ref = jax.grad(lambda *a: ref_fn(*a).astype(jnp.float32).sum(),
                         argnums=i)(*args)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)


def test_conv3_vjp_matches_autodiff():
    fine, _, x, n = setup()
    w = jnp.asarray((rng.randn(27, 6, 5) * 0.2).astype(np.float32))
    # weighted output sum so the cotangent isn't constant
    weights = jnp.asarray(rng.randn(fine.num_padded, 5).astype(np.float32))
    custom = lambda x, w: (conv_ops.sparse_conv3(x, w, fine, impl="scan") * weights)
    ref = lambda x, w: (conv_ops.sparse_conv3(x, w, fine, impl="unroll") * weights)
    np.testing.assert_allclose(np.asarray(custom(x, w)), np.asarray(ref(x, w)),
                               rtol=1e-4, atol=1e-5)
    check_grads(custom, ref, (x, w))


def test_conv_down2_vjp_matches_autodiff():
    fine, coarse, x, n = setup(seed=2)
    w = jnp.asarray((rng.randn(8, 6, 5) * 0.2).astype(np.float32))
    weights = jnp.asarray(rng.randn(coarse.num_padded, 5).astype(np.float32))
    custom = lambda x, w: (conv_ops.sparse_conv_down2(x, w, coarse, fine=fine) * weights)
    ref = lambda x, w: (conv_ops.sparse_conv_down2(x, w, coarse) * weights)
    np.testing.assert_allclose(np.asarray(custom(x, w)), np.asarray(ref(x, w)),
                               rtol=1e-4, atol=1e-5)
    check_grads(custom, ref, (x, w))


def test_conv_up2_vjp_matches_autodiff():
    fine, coarse, _, n = setup(seed=3)
    xc = jnp.asarray(rng.randn(coarse.num_padded, 6).astype(np.float32)
                     * np.asarray(coarse.valid)[:, None])
    w = jnp.asarray((rng.randn(8, 6, 5) * 0.2).astype(np.float32))
    weights = jnp.asarray(rng.randn(fine.num_padded, 5).astype(np.float32))
    custom = lambda x, w: (conv_ops.sparse_conv_up2(x, w, fine, coarse=coarse) * weights)
    ref = lambda x, w: (conv_ops.sparse_conv_up2(x, w, fine) * weights)
    np.testing.assert_allclose(np.asarray(custom(xc, w)), np.asarray(ref(xc, w)),
                               rtol=1e-4, atol=1e-5)
    check_grads(custom, ref, (xc, w))


def test_avg_pool2_vjp_matches_autodiff():
    """avg_pool2's custom VJP (parent gather; required because the windowed
    pooling forward is a Pallas call with no autodiff) must equal XLA
    autodiff of the gather formulation -- with and without win tables."""
    fine, coarse, x, n = setup(seed=5)
    weights = jnp.asarray(rng.randn(coarse.num_padded, 6).astype(np.float32))
    custom = lambda x: (conv_ops.avg_pool2(x, coarse, fine=fine) * weights)
    ref = lambda x: (conv_ops.avg_pool2(x, coarse) * weights)
    np.testing.assert_allclose(np.asarray(custom(x)), np.asarray(ref(x)),
                               rtol=1e-4, atol=1e-5)
    check_grads(custom, ref, (x,), wrt=(0,))

    # windowed tables (the path that NEEDS the VJP): rebuild the graph with
    # win levels so pads meet the 256-row tile alignment
    r = np.random.RandomState(5)
    coords = np.unique(np.column_stack([
        r.randint(0, 2, 1600), r.randint(-12, 12, (1600, 3))
    ]), axis=0)[:400].astype(np.int32)
    gw = build_sparse_graph(coords, num_levels=2, win_levels=(0, 1),
                            win_group=1)
    fine_w, coarse_w = gw.levels[0], gw.levels[1]
    assert coarse_w.win_down is not None
    xw = np.zeros((fine_w.num_padded, 6), np.float32)
    xw[: len(coords)] = r.randn(len(coords), 6)
    xw = jnp.asarray(xw)
    weights_w = jnp.asarray(
        r.randn(coarse_w.num_padded, 6).astype(np.float32))
    coarse_g = coarse_w.replace(win_down=None)
    custom_w = lambda x: (conv_ops.avg_pool2(x, coarse_w, fine=fine_w)
                          * weights_w)
    ref_w = lambda x: (conv_ops.avg_pool2(x, coarse_g) * weights_w)
    np.testing.assert_allclose(np.asarray(custom_w(xw)),
                               np.asarray(ref_w(xw)), rtol=1e-4, atol=1e-5)
    check_grads(custom_w, ref_w, (xw,), wrt=(0,))


def test_bias_grads():
    fine, _, x, n = setup(seed=4)
    w = jnp.asarray((rng.randn(27, 6, 5) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.randn(5).astype(np.float32))
    custom = lambda b: conv_ops.sparse_conv3(x, w, fine, bias=b).astype(jnp.float32).sum()
    g = jax.grad(custom)(b)
    # d/db of sum over valid rows = number of valid rows
    np.testing.assert_allclose(np.asarray(g), float(np.asarray(fine.valid).sum()),
                               rtol=1e-5)


def test_fused_impl_matches_scan():
    """The big-K fused formulation must match the scan formulation in both
    forward and gradients."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops import conv_ops

    scene = make_scene(num_points=4000, num_objects=3, extent=3.0, seed=0)
    batch, _ = FreeMaskCollator(voxel_size=0.05)([scene])
    level = batch.graph.levels[1]
    rng = np.random.RandomState(0)
    n, cin, cout = level.num_padded, 8, 8
    x = jnp.asarray(rng.rand(n, cin).astype(np.float32)) * \
        level.valid[:, None].astype(jnp.float32)
    w = jnp.asarray(rng.rand(27, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.rand(cout).astype(np.float32))
    cot = jnp.asarray(rng.rand(n, cout).astype(np.float32))

    def loss(impl):
        def f(x, w, bias):
            return (conv_ops.sparse_conv3(x, w, level, bias, impl=impl) * cot).sum()
        return f

    o_scan = conv_ops.sparse_conv3(x, w, level, bias, impl="scan")
    o_fused = conv_ops.sparse_conv3(x, w, level, bias, impl="fused")
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_scan),
                               rtol=1e-4, atol=1e-4)

    g_scan = jax.grad(loss("scan"), argnums=(0, 1, 2))(x, w, bias)
    g_fused = jax.grad(loss("fused"), argnums=(0, 1, 2))(x, w, bias)
    for a, b in zip(g_fused, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
