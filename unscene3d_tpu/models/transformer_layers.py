"""Transformer layers for the mask decoder (reference models/mask3d.py:491-652).

Post-norm variants (the reference runs pre_norm=false, conf/model/mask3d.yaml).
Dropout mirrors the reference's placement (attention weights, residual
branches, FFN hidden activations); the reference default is 0.0
(conf/model/mask3d.yaml), so `deterministic=True` / rate 0 is the common path
and adds no ops.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _flash_masked_attention(qh, kh, vh, block_mask, inv_sqrt, ch, dtype):
    """Online-softmax (flash) masked attention over KV chunks.

    Numerically equivalent to softmax(QK/sqrt(d) masked) @ V up to the
    standard flash reassociation of the softmax sums; avoids materializing
    the (B, H, Q, P) logits (157MB at the eval decoder's finest level --
    the one-shot path is pure HBM traffic for ~5 GFLOP of matmul).
    block_mask True = do NOT attend; fully-masked rows degrade to the
    uniform average, matching softmax over constant (finite) neg logits.
    """
    B, P, H, dh = kh.shape
    nc = P // ch
    neg = jnp.asarray(jnp.finfo(jnp.float32).min / 2, qh.dtype)

    def step(carry, c):
        m, s, o = carry
        p0 = c * ch
        # slice chunks in place -- pre-splitting k/v/mask into scan inputs
        # materializes layout-transposed copies (~1ms/fwd at P=98k)
        kcc = jax.lax.dynamic_slice_in_dim(kh, p0, ch, axis=1)
        vcc = jax.lax.dynamic_slice_in_dim(vh, p0, ch, axis=1)
        lg = jnp.einsum("bqhd,bchd->bhqc", qh, kcc) * inv_sqrt
        if block_mask is not None:
            mcc = jax.lax.dynamic_slice_in_dim(block_mask, p0, ch, axis=2)
            lg = jnp.where(mcc[:, None], neg, lg)
        lg = lg.astype(jnp.float32)
        m2 = jnp.maximum(m, lg.max(-1))
        corr = jnp.exp(m - m2)
        p = jnp.exp(lg - m2[..., None])
        s = s * corr + p.sum(-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhqc,bchd->bhqd", p.astype(dtype), vcc).astype(jnp.float32)
        return (m2, s, o), None

    Q = qh.shape[1]
    m0 = jnp.full((B, H, Q), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((B, H, Q), jnp.float32)
    o0 = jnp.zeros((B, H, Q, dh), jnp.float32)
    (m, s, o), _ = jax.lax.scan(step, (m0, s0, o0),
                                jnp.arange(nc, dtype=jnp.int32))
    out = o / jnp.maximum(s, 1e-30)[..., None]
    return jnp.moveaxis(out, 1, 2).astype(dtype)        # (B, Q, H, dh)


class MultiheadAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, block_mask=None, deterministic: bool = True):
        """q: (B, Q, D), k/v: (B, P, D), block_mask: (B, Q, P) True = do NOT attend."""
        d_head = self.d_model // self.num_heads
        dense = lambda name: nn.DenseGeneral(
            (self.num_heads, d_head), dtype=self.dtype, name=name
        )
        qh = dense("q_proj")(q)
        kh = dense("k_proj")(k)
        vh = dense("v_proj")(v)
        inv_sqrt = (1.0 / jnp.sqrt(jnp.asarray(d_head, jnp.float32))
                    ).astype(self.dtype)
        P = kh.shape[1]
        ch = next((c for c in (8192, 4096, 2048) if P % c == 0 and P > c),
                  None)
        if ch is not None and P >= 16384 and self.dropout == 0.0:
            out = _flash_masked_attention(qh, kh, vh, block_mask, inv_sqrt,
                                          ch, self.dtype)
        else:
            logits = jnp.einsum("bqhd,bphd->bhqp", qh, kh) * inv_sqrt
            if block_mask is not None:
                neg = jnp.asarray(jnp.finfo(jnp.float32).min / 2,
                                  logits.dtype)
                logits = jnp.where(block_mask[:, None, :, :], neg, logits)
            attn = nn.softmax(logits.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
            if self.dropout > 0.0:
                # torch nn.MultiheadAttention drops attention weights
                attn = nn.Dropout(self.dropout)(attn,
                                                deterministic=deterministic)
            out = jnp.einsum("bhqp,bphd->bqhd", attn, vh)
        return nn.DenseGeneral(
            self.d_model, axis=(-2, -1), dtype=self.dtype, name="out_proj"
        )(out)


class CrossAttentionLayer(nn.Module):
    d_model: int
    num_heads: int
    pre_norm: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, block_mask=None, pos=None, query_pos=None,
                 deterministic: bool = True):
        norm = nn.LayerNorm(dtype=self.dtype)
        src = norm(tgt) if self.pre_norm else tgt
        q = src if query_pos is None else src + query_pos
        k = memory if pos is None else memory + pos
        tgt2 = MultiheadAttention(self.d_model, self.num_heads,
                                  dropout=self.dropout, dtype=self.dtype)(
            q, k, memory, block_mask, deterministic=deterministic
        )
        if self.dropout > 0.0:
            tgt2 = nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        if self.pre_norm:
            return tgt + tgt2
        return norm(tgt + tgt2)


class SelfAttentionLayer(nn.Module):
    d_model: int
    num_heads: int
    pre_norm: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos=None, deterministic: bool = True):
        norm = nn.LayerNorm(dtype=self.dtype)
        src = norm(tgt) if self.pre_norm else tgt
        q = src if query_pos is None else src + query_pos
        tgt2 = MultiheadAttention(self.d_model, self.num_heads,
                                  dropout=self.dropout, dtype=self.dtype)(
            q, q, src, deterministic=deterministic
        )
        if self.dropout > 0.0:
            tgt2 = nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        if self.pre_norm:
            return tgt + tgt2
        return norm(tgt + tgt2)


class FFNLayer(nn.Module):
    d_model: int
    dim_feedforward: int = 1024
    pre_norm: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, deterministic: bool = True):
        norm = nn.LayerNorm(dtype=self.dtype)
        src = norm(tgt) if self.pre_norm else tgt
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(src)
        h = nn.relu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if self.pre_norm:
            return tgt + h
        return norm(tgt + h)
