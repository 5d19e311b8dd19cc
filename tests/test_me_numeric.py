"""Numeric validation of the MinkowskiEngine conversion path (VERDICT r2 #3).

MinkowskiEngine state dicts store k^3 sparse-conv kernels as (K, Cin, Cout)
with offsets enumerated FIRST-COORDINATE-FASTEST (ME kernel_region.hpp: the
region iterator increments dim 0 until it wraps). On a fully-occupied dense
grid a submanifold sparse conv equals a dense 3-D cross-correlation, so
torch's conv3d gives ground-truth activations for ME semantics: offset
(dx,dy,dz) maps to dense-kernel tap [dx+1, dy+1, dz+1].

These tests build ME-format weights, compute reference activations with
torch (CPU), convert with models/torch_convert.py, run our engine, and
assert numeric equality -- conv layer, strided conv, transposed conv, and a
full BasicBlock with folded BN. This pins the converter's offset
permutation numerically, not just structurally (docs/DESIGN.md gap).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from unscene3d_tpu.data.collate import FreeMaskCollator
from unscene3d_tpu.models.torch_convert import me_offset_permutation
from unscene3d_tpu.ops import conv_ops
from unscene3d_tpu.ops.kernel_maps import KERNEL2_OFFSETS, KERNEL3_OFFSETS


def _dense_scene(extent=6, keep=0.7, seed=0):
    """Random sparse voxel set inside a small grid + its dense tensor."""
    r = np.random.RandomState(seed)
    xyz = np.array([[x, y, z] for x in range(extent)
                    for y in range(extent) for z in range(extent)])
    sel = r.rand(len(xyz)) < keep
    coords = xyz[sel]
    return coords


def _batch_from_coords(coords, cin, seed=1):
    r = np.random.RandomState(seed)
    scene = dict(
        xyz=coords.astype(np.float32) * 0.02 + 0.01,
        features=r.randn(len(coords), cin).astype(np.float32),
        colors=np.zeros((len(coords), 3), np.float32),
        segments=np.zeros(len(coords), np.int64),
        masks=np.ones((len(coords), 1), bool),
    )
    batch, meta = FreeMaskCollator(voxel_size=0.02)([scene])
    return batch, meta, scene


def _dense_grid(coords, feats, extent, cin):
    dense = np.zeros((1, cin, extent, extent, extent), np.float32)
    dense[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return torch.from_numpy(dense)


def _me_weight_k3(cin, cout, seed=3):
    """(27, Cin, Cout) in ME's first-coordinate-fastest offset order."""
    return np.random.RandomState(seed).randn(27, cin, cout).astype(np.float32)


def test_k3_conv_matches_torch_dense():
    extent, cin, cout = 6, 5, 4
    coords = _dense_scene(extent)
    batch, meta, scene = _batch_from_coords(coords, cin)
    level = batch.graph.levels[0]
    n = meta.num_voxels[0]
    feats = np.zeros((level.num_padded, cin), np.float32)
    feats[:n] = scene["features"]

    w_me = _me_weight_k3(cin, cout)

    # ---- torch ground truth: dense cross-correlation; ME offset i has
    # dx fastest: (dx, dy, dz) = (i % 3 - 1, i // 3 % 3 - 1, i // 9 - 1)
    w_dense = torch.zeros(cout, cin, 3, 3, 3)
    for i in range(27):
        dx, dy, dz = i % 3 - 1, (i // 3) % 3 - 1, i // 9 - 1
        w_dense[:, :, dx + 1, dy + 1, dz + 1] = torch.from_numpy(w_me[i].T)
    dense_in = _dense_grid(coords, scene["features"], extent, cin)
    with torch.no_grad():
        dense_out = torch.nn.functional.conv3d(dense_in, w_dense, padding=1)
    ref = dense_out[0, :, coords[:, 0], coords[:, 1], coords[:, 2]].T.numpy()

    # ---- ours: converter permutation into KERNEL3_OFFSETS order
    perm = me_offset_permutation(3)
    w_ours = jnp.asarray(w_me[perm])
    # sanity: the permutation must map ME slot i to our offset table slot
    for j in range(27):
        i = perm[j]
        dx, dy, dz = i % 3 - 1, (i // 3) % 3 - 1, i // 9 - 1
        assert tuple(KERNEL3_OFFSETS[j]) == (dx, dy, dz), (
            "me_offset_permutation disagrees with ME's dim-0-fastest order")
    out = conv_ops.sparse_conv3(jnp.asarray(feats), w_ours, level, impl="scan")
    # voxel row order: collate sorts by ravel key; match coords via lookup
    got = np.asarray(out)[:n]
    lvl_coords = np.asarray(level.coords[:n, 1:])
    order = {tuple(c): i for i, c in enumerate(coords)}
    idx = np.array([order[tuple(c)] for c in lvl_coords])
    np.testing.assert_allclose(got, ref[idx], rtol=2e-4, atol=2e-4)


def test_k2s2_down_conv_matches_torch_dense():
    extent, cin, cout = 6, 4, 3
    coords = _dense_scene(extent, keep=1.0)      # full grid: sparse == dense
    batch, meta, scene = _batch_from_coords(coords, cin)
    fine, coarse = batch.graph.levels[0], batch.graph.levels[1]
    n = meta.num_voxels[0]
    feats = np.zeros((fine.num_padded, cin), np.float32)
    feats[:n] = scene["features"]

    w_me = np.random.RandomState(5).randn(8, cin, cout).astype(np.float32)
    w_dense = torch.zeros(cout, cin, 2, 2, 2)
    for i in range(8):
        dx, dy, dz = i % 2, (i // 2) % 2, i // 4
        w_dense[:, :, dx, dy, dz] = torch.from_numpy(w_me[i].T)
    dense_in = _dense_grid(coords, scene["features"], extent, cin)
    with torch.no_grad():
        dense_out = torch.nn.functional.conv3d(dense_in, w_dense, stride=2)
    # ours: KERNEL2_OFFSETS order is dx*4 + dy*2 + dz (dz fastest)
    perm = np.zeros(8, np.int64)
    for j, (dx, dy, dz) in enumerate(KERNEL2_OFFSETS):
        perm[j] = dx + dy * 2 + dz * 4          # ME dim-0-fastest slot
    w_ours = jnp.asarray(w_me[perm])
    out = conv_ops.sparse_conv_down2(jnp.asarray(feats), w_ours, coarse)
    nc = int(np.asarray(coarse.valid).sum())
    got = np.asarray(out)[:nc]
    cc = np.asarray(coarse.coords[:nc, 1:])
    ref = dense_out[0, :, cc[:, 0], cc[:, 1], cc[:, 2]].T.numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_basic_block_with_bn_matches_torch():
    """conv-bn-relu-conv-bn + residual + relu with ME weights == torch dense
    pipeline (eval-mode BN with running stats)."""
    extent, ch = 6, 8
    coords = _dense_scene(extent, keep=0.65, seed=7)
    batch, meta, scene = _batch_from_coords(coords, ch, seed=2)
    level = batch.graph.levels[0]
    n = meta.num_voxels[0]
    feats = np.zeros((level.num_padded, ch), np.float32)
    feats[:n] = scene["features"]

    r = np.random.RandomState(11)
    w1 = r.randn(27, ch, ch).astype(np.float32) * 0.2
    w2 = r.randn(27, ch, ch).astype(np.float32) * 0.2
    bn1 = dict(weight=r.rand(ch).astype(np.float32) + 0.5,
               bias=r.randn(ch).astype(np.float32) * 0.1,
               mean=r.randn(ch).astype(np.float32) * 0.1,
               var=r.rand(ch).astype(np.float32) + 0.5)
    bn2 = dict(weight=r.rand(ch).astype(np.float32) + 0.5,
               bias=r.randn(ch).astype(np.float32) * 0.1,
               mean=r.randn(ch).astype(np.float32) * 0.1,
               var=r.rand(ch).astype(np.float32) + 0.5)

    def dense_w(w_me):
        w = torch.zeros(ch, ch, 3, 3, 3)
        for i in range(27):
            dx, dy, dz = i % 3 - 1, (i // 3) % 3 - 1, i // 9 - 1
            w[:, :, dx + 1, dy + 1, dz + 1] = torch.from_numpy(w_me[i].T)
        return w

    def t_bn(x, p):
        s = torch.from_numpy(p["weight"] / np.sqrt(p["var"] + 1e-5))
        b = torch.from_numpy(p["bias"] - p["mean"] * p["weight"]
                             / np.sqrt(p["var"] + 1e-5))
        return x * s[None, :, None, None, None] + b[None, :, None, None, None]

    dense_in = _dense_grid(coords, scene["features"], extent, ch)
    occ = torch.zeros(1, 1, extent, extent, extent)
    occ[0, 0, coords[:, 0], coords[:, 1], coords[:, 2]] = 1
    with torch.no_grad():
        h = torch.nn.functional.conv3d(dense_in, dense_w(w1), padding=1)
        h = torch.relu(t_bn(h, bn1)) * occ      # submanifold: only occupied
        h = torch.nn.functional.conv3d(h, dense_w(w2), padding=1)
        h = t_bn(h, bn2)
        out_t = torch.relu(h + dense_in) * occ
    ref = out_t[0, :, coords[:, 0], coords[:, 1], coords[:, 2]].T.numpy()

    perm = me_offset_permutation(3)
    x = jnp.asarray(feats)
    valid = level.valid

    def fold(p):
        s = p["weight"] / np.sqrt(p["var"] + 1e-5)
        return jnp.asarray(s), jnp.asarray(p["bias"] - p["mean"] * s)

    s1, b1 = fold(bn1)
    s2, b2 = fold(bn2)
    h = conv_ops.sparse_conv3(x, jnp.asarray(w1[perm]), level, impl="scan")
    h = jnp.maximum(h.astype(jnp.float32) * s1 + b1, 0.0)
    h = h * valid[:, None].astype(jnp.float32)
    h = conv_ops.sparse_conv3(h.astype(x.dtype), jnp.asarray(w2[perm]),
                              level, impl="scan")
    h = h.astype(jnp.float32) * s2 + b2
    out = jnp.maximum(h + x.astype(jnp.float32), 0.0)
    out = out * valid[:, None].astype(jnp.float32)

    got = np.asarray(out)[:n]
    lvl_coords = np.asarray(level.coords[:n, 1:])
    order = {tuple(c): i for i, c in enumerate(coords)}
    idx = np.array([order[tuple(c)] for c in lvl_coords])
    np.testing.assert_allclose(got, ref[idx], rtol=5e-4, atol=5e-4)
