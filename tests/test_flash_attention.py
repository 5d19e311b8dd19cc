"""Flash (online-softmax) masked attention vs the one-shot dense path.

The decoder's large-KV cross-attention streams KV chunks
(models/transformer_layers.py::_flash_masked_attention); these tests pin
it against the dense softmax formulation, including the fully-masked-row
degenerate case (uniform average, matching softmax over constant finite
neg logits) and the no-mask path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unscene3d_tpu.models.transformer_layers import (MultiheadAttention,
                                                     _flash_masked_attention)


def _dense_reference(qh, kh, vh, mask, inv):
    lg = jnp.einsum("bqhd,bphd->bhqp", qh, kh) * inv
    if mask is not None:
        neg = jnp.asarray(np.finfo(np.float32).min / 2, lg.dtype)
        lg = jnp.where(mask[:, None], neg, lg)
    attn = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqp,bphd->bqhd", attn.astype(qh.dtype), vh)


def test_flash_matches_dense_masked():
    rng = np.random.RandomState(0)
    B, Q, P, H, dh = 2, 16, 8192, 4, 8
    qh = jnp.asarray(rng.randn(B, Q, H, dh), jnp.float32)
    kh = jnp.asarray(rng.randn(B, P, H, dh), jnp.float32)
    vh = jnp.asarray(rng.randn(B, P, H, dh), jnp.float32)
    mask = jnp.asarray(rng.rand(B, Q, P) < 0.7)
    mask = mask.at[0, 0].set(True)          # fully-blocked query row
    mask = mask.at[1, 3].set(False)         # fully-open query row
    inv = jnp.asarray(1.0 / np.sqrt(dh), jnp.float32)
    ref = _dense_reference(qh, kh, vh, mask, inv)
    got = _flash_masked_attention(qh, kh, vh, mask, inv, 1024, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_flash_matches_dense_unmasked():
    rng = np.random.RandomState(1)
    B, Q, P, H, dh = 1, 8, 4096, 2, 16
    qh = jnp.asarray(rng.randn(B, Q, H, dh), jnp.float32)
    kh = jnp.asarray(rng.randn(B, P, H, dh), jnp.float32)
    vh = jnp.asarray(rng.randn(B, P, H, dh), jnp.float32)
    inv = jnp.asarray(1.0 / np.sqrt(dh), jnp.float32)
    ref = _dense_reference(qh, kh, vh, None, inv)
    got = _flash_masked_attention(qh, kh, vh, None, inv, 512, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_module_routes_large_kv_through_flash():
    """The module's flash-routed output matches a dense recomputation from
    the same projection weights (P above the 16k flash threshold)."""
    rng = np.random.RandomState(2)
    B, Q, D, H = 1, 4, 32, 4
    P = 16384                                # >= threshold and chunkable
    mha = MultiheadAttention(d_model=D, num_heads=H, dtype=jnp.float32)
    q = jnp.asarray(rng.randn(B, Q, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, P, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, P, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, Q, P) < 0.5)
    params = mha.init(jax.random.PRNGKey(0), q, k, v, mask)
    out_flash = mha.apply(params, q, k, v, mask)

    pr = params["params"]
    proj = lambda x, nm: (jnp.einsum("bnd,dhe->bnhe", x, pr[nm]["kernel"])
                          + pr[nm]["bias"])
    qh, kh, vh = proj(q, "q_proj"), proj(k, "k_proj"), proj(v, "v_proj")
    inv = jnp.asarray(1.0 / np.sqrt(D // H), jnp.float32)
    dense = _dense_reference(qh, kh, vh, mask, inv)
    want = (jnp.einsum("bqhe,hed->bqd", dense, pr["out_proj"]["kernel"])
            + pr["out_proj"]["bias"])
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
