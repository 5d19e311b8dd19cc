"""pointops2 grouped-attention + RPE ops vs numpy oracles replicating the
CUDA kernel math (utils/pointops2/src/{attention,rpe}/*.cu)."""

import numpy as np

import jax
import jax.numpy as jnp

from unscene3d_tpu.ops.pointops2 import (
    attention_step1, attention_step2, attention_step2_with_rel_pos_value,
    dot_prod_with_idx, grouped_softmax)


def _pairs(rng, n_q=12, n_k=15, m=60):
    return (rng.randint(0, n_q, m).astype(np.int32),
            rng.randint(0, n_k, m).astype(np.int32))


def test_attention_step1_oracle():
    rng = np.random.RandomState(0)
    n_q, n_k, h, d, m = 12, 15, 4, 8, 60
    q = rng.randn(n_q, h, d).astype(np.float32)
    k = rng.randn(n_k, h, d).astype(np.float32)
    i0, i1 = _pairs(rng, n_q, n_k, m)
    got = np.asarray(attention_step1(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(i0), jnp.asarray(i1)))
    want = np.einsum("mhd,mhd->mh", q[i0], k[i1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_attention_step2_oracle_and_grads():
    rng = np.random.RandomState(1)
    n_q, n_k, h, d, m = 10, 14, 3, 6, 50
    attn = rng.rand(m, h).astype(np.float32)
    v = rng.randn(n_k, h, d).astype(np.float32)
    i0, i1 = _pairs(rng, n_q, n_k, m)
    got = np.asarray(attention_step2(jnp.asarray(attn), jnp.asarray(v),
                                     jnp.asarray(i0), jnp.asarray(i1),
                                     num_out=n_q))
    want = np.zeros((n_q, h, d), np.float32)
    for mm in range(m):
        want[i0[mm]] += attn[mm][:, None] * v[i1[mm]]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # grads exist and are deterministic (the reference backward is atomicAdd)
    def loss(attn, v):
        return attention_step2(attn, v, jnp.asarray(i0), jnp.asarray(i1),
                               num_out=n_q).sum()

    ga, gv = jax.grad(loss, argnums=(0, 1))(jnp.asarray(attn), jnp.asarray(v))
    ga2, gv2 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(attn), jnp.asarray(v))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(ga2))
    assert np.isfinite(np.asarray(gv)).all()


def test_dot_prod_with_idx_oracle():
    rng = np.random.RandomState(2)
    n, h, d, L, m = 9, 2, 5, 7, 40
    q = rng.randn(n, h, d).astype(np.float32)
    table = rng.randn(L, h, d, 3).astype(np.float32)
    index = rng.randint(0, n, m).astype(np.int32)
    rel_idx = rng.randint(0, L, (m, 3)).astype(np.int32)
    got = np.asarray(dot_prod_with_idx(jnp.asarray(q), jnp.asarray(index),
                                       jnp.asarray(table), jnp.asarray(rel_idx)))
    want = np.zeros((m, h), np.float32)
    for mm in range(m):
        for ax in range(3):
            want[mm] += np.einsum("hd,hd->h", q[index[mm]],
                                  table[rel_idx[mm, ax], :, :, ax])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attention_step2_with_rel_pos_value_oracle():
    rng = np.random.RandomState(3)
    n_q, n_k, h, d, L, m = 8, 11, 2, 4, 6, 30
    attn = rng.rand(m, h).astype(np.float32)
    v = rng.randn(n_k, h, d).astype(np.float32)
    table = rng.randn(L, h, d, 3).astype(np.float32)
    i0, i1 = _pairs(rng, n_q, n_k, m)
    rel_idx = rng.randint(0, L, (m, 3)).astype(np.int32)
    got = np.asarray(attention_step2_with_rel_pos_value(
        jnp.asarray(attn), jnp.asarray(v), jnp.asarray(i0), jnp.asarray(i1),
        jnp.asarray(table), jnp.asarray(rel_idx), num_out=n_q))
    want = np.zeros((n_q, h, d), np.float32)
    for mm in range(m):
        pair_val = v[i1[mm]].copy()
        for ax in range(3):
            pair_val += table[rel_idx[mm, ax], :, :, ax]
        want[i0[mm]] += attn[mm][:, None] * pair_val
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grouped_softmax():
    rng = np.random.RandomState(4)
    m, h, n_q = 40, 3, 6
    attn = rng.randn(m, h).astype(np.float32) * 3
    i0 = np.sort(rng.randint(0, n_q, m)).astype(np.int32)
    got = np.asarray(grouped_softmax(jnp.asarray(attn), jnp.asarray(i0),
                                     num_out=n_q))
    for g in range(n_q):
        sel = i0 == g
        if sel.any():
            e = np.exp(attn[sel] - attn[sel].max(0))
            np.testing.assert_allclose(got[sel], e / e.sum(0), rtol=1e-4,
                                       atol=1e-5)
    # each group's weights sum to 1
    sums = np.zeros((n_q, h))
    np.add.at(sums, i0, got)
    present = np.isin(np.arange(n_q), i0)
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-4)
