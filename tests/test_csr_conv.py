"""CSR-compacted Pallas sparse conv vs the gather-formulation oracle
(ops/csr_conv.py). Runs the kernel in interpret mode on CPU; the real-chip
equivalence is re-checked by bench.py's finite/inference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unscene3d_tpu.ops import csr_conv
from unscene3d_tpu.ops.csr_conv import TILE, build_csr_graph, csr_conv3_fwd
from unscene3d_tpu.ops.kernel_maps import build_neighbor_map


def _random_level(n=300, seed=0, n_pad=2 * TILE):
    """Random sparse voxel set padded to n_pad with a k3 neighbor map."""
    rng = np.random.RandomState(seed)
    coords = np.unique(rng.randint(0, 12, (n, 3)), axis=0).astype(np.int32)
    n = len(coords)
    assert n < n_pad
    coords4 = np.column_stack([np.zeros(n, np.int32), coords])  # [b,x,y,z]
    nbr_idx, nbr_valid = build_neighbor_map(coords4)
    # pad: missing neighbors -> n_pad - 1 (the always-padding row)
    full = np.full((27, n_pad), n_pad - 1, np.int32)
    full[:, :n] = np.where(nbr_valid, nbr_idx, n_pad - 1)
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    return full, valid, n


def _dense_oracle(x, w, nbr, valid, n_pad):
    out = np.zeros((n_pad, w.shape[-1]), np.float32)
    for k in range(27):
        src = nbr[k]
        ok = (src != n_pad - 1) & valid
        contrib = x[src] @ w[k]
        out[ok] += contrib[ok]
    out[~valid] = 0
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_csr_conv_matches_dense_oracle_interpret(seed):
    n_pad = 2 * TILE
    nbr, valid, n = _random_level(seed=seed, n_pad=n_pad)
    rng = np.random.RandomState(seed + 10)
    cin, cout = 8, 8
    x = np.zeros((n_pad, cin), np.float32)
    x[:n] = rng.rand(n, cin).astype(np.float32)
    w = rng.rand(27, cin, cout).astype(np.float32) * 0.1

    csr = build_csr_graph(nbr, n_pad)
    # ragged buckets: per-offset sizes, each >= count + 2*TILE
    assert len(csr.pb) == 26 and all(b % TILE == 0 for b in csr.pb)

    got = np.asarray(csr_conv3_fwd(
        jnp.asarray(x), jnp.asarray(w), csr, jnp.asarray(valid),
        interpret=True))
    want = _dense_oracle(x, w, nbr, valid, n_pad)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_csr_explicit_pb_roundtrip():
    """Pad-plan style: build with explicit (merged) per-offset buckets."""
    n_pad = 2 * TILE
    nbr, valid, n = _random_level(seed=3, n_pad=n_pad)
    auto = build_csr_graph(nbr, n_pad)
    bigger = [b + TILE for b in auto.pb]
    csr = build_csr_graph(nbr, n_pad, pb=bigger)
    assert csr.pb == tuple(bigger)
    rng = np.random.RandomState(4)
    x = np.zeros((n_pad, 8), np.float32)
    x[:n] = rng.rand(n, 8)
    w = rng.rand(27, 8, 8).astype(np.float32) * 0.1
    a = np.asarray(csr_conv3_fwd(jnp.asarray(x), jnp.asarray(w), auto,
                                 jnp.asarray(valid), interpret=True))
    b = np.asarray(csr_conv3_fwd(jnp.asarray(x), jnp.asarray(w), csr,
                                 jnp.asarray(valid), interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_csr_vjp_matches_gather_grads():
    """dx/dW of the custom VJP vs autodiff of the dense oracle formulation."""
    n_pad = 2 * TILE
    nbr, valid, n = _random_level(seed=7, n_pad=n_pad)
    rng = np.random.RandomState(8)
    cin = cout = 8
    x = np.zeros((n_pad, cin), np.float32)
    x[:n] = rng.rand(n, cin)
    w = rng.rand(27, cin, cout).astype(np.float32) * 0.1
    csr = build_csr_graph(nbr, n_pad)
    valid_j = jnp.asarray(valid)
    cot = jnp.asarray(rng.rand(n_pad, cout).astype(np.float32))

    def f_csr(x, w):
        return (csr_conv.csr_conv3(x, w, csr, valid_j) * cot).sum()

    def f_ref(x, w):
        out = 0.0
        nb = jnp.asarray(nbr)
        ok = (nb != n_pad - 1) & valid_j[None, :]
        for k in range(27):
            contrib = jnp.take(x, nb[k], axis=0) @ w[k]
            out = out + (jnp.where(ok[k][:, None], contrib, 0.0) * cot).sum()
        return out

    with csr_conv.gather_fallback():
        pass  # ensure context manager exists; grads below run interpret
    gx1, gw1 = jax.grad(f_csr, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gx2, gw2 = jax.grad(f_ref, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx1)[:n], np.asarray(gx2)[:n],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-3, atol=1e-4)
