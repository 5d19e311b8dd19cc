"""pointops2 grouped-attention + relative-position-encoding ops.

The reference vendors a ~3.8k-LoC CUDA library
(utils/pointops2/functions/pointops.py:78-829 + src/attention, src/rpe) for
point-transformer attention over KNN pair lists. It is dead code in the
UnScene3D pipeline (verified by its own survey), but the ops are part of the
component inventory, so here are TPU-native equivalents: every pair-indexed
accumulation is a deterministic `segment_sum` / gather expression whose
backwards (the hand-written atomicAdd kernels in the reference) come from
JAX autodiff of the same formulation.

Conventions follow the CUDA kernels exactly:
- q/k/v: (N, h, hdim); pair lists index0 (out point), index1 (in point),
  both (M,).
- RPE tables: (L, h, hdim, 3) indexed by per-axis relative-position bins
  rel_idx (M, 3); contributions summed over the 3 axes
  (src/rpe/relative_pos_encoding_cuda_kernel.cu:5-23).
"""

from __future__ import annotations

import jax.numpy as jnp

from unscene3d_tpu.ops.segment_ops import segment_sum


def attention_step1(q: jnp.ndarray, k: jnp.ndarray, index0: jnp.ndarray,
                    index1: jnp.ndarray) -> jnp.ndarray:
    """Per-pair attention logits: out[m, h] = q[index0[m], h] . k[index1[m], h]
    (pointops.py:78-99, attention_cuda_kernel.cu:5-18). Returns (M, h)."""
    qm = jnp.take(q, index0, axis=0)
    km = jnp.take(k, index1, axis=0)
    return (qm * km).sum(-1)


def attention_step2(attn: jnp.ndarray, v: jnp.ndarray, index0: jnp.ndarray,
                    index1: jnp.ndarray,
                    num_out: int | None = None) -> jnp.ndarray:
    """Weighted value aggregation: out[i, h] = sum_{m: index0[m]=i}
    attn[m, h] * v[index1[m], h] (pointops.py:203-224). Returns
    (num_out, h, hdim); num_out defaults to max(index0)+1 like the CUDA
    wrapper (pass it explicitly under jit)."""
    if num_out is None:
        num_out = int(index0.max()) + 1
    vm = jnp.take(v, index1, axis=0)                     # (M, h, hdim)
    contrib = attn[..., None] * vm
    flat = contrib.reshape(contrib.shape[0], -1)
    out = segment_sum(flat, index0, num_out)
    return out.reshape(num_out, v.shape[1], v.shape[2])


def dot_prod_with_idx(q: jnp.ndarray, index: jnp.ndarray, table: jnp.ndarray,
                      rel_idx: jnp.ndarray) -> jnp.ndarray:
    """RPE logits: out[m, h] = sum_axis sum_d q[index[m], h, d] *
    table[rel_idx[m, axis], h, d, axis]
    (relative_pos_encoding_cuda_kernel.cu:5-23). Returns (M, h)."""
    qm = jnp.take(q, index, axis=0)                      # (M, h, hdim)
    # (M, 3, h, hdim): per-axis table rows at each pair's bins
    tm = jnp.take(table, rel_idx, axis=0)                # (M, 3, h, hdim, 3)
    axes = jnp.arange(3)
    tm = jnp.take_along_axis(
        tm, axes[None, :, None, None, None], axis=-1)[..., 0]  # (M, 3, h, hdim)
    return (qm[:, None] * tm).sum(-1).sum(1)


def attention_step2_with_rel_pos_value(
        attn: jnp.ndarray, v: jnp.ndarray, index0: jnp.ndarray,
        index1: jnp.ndarray, table: jnp.ndarray, rel_idx: jnp.ndarray,
        num_out: int | None = None) -> jnp.ndarray:
    """Value aggregation with additive per-pair RPE values:
    out[i] = sum_m attn[m] * (v[index1[m]] + sum_axis table[rel_idx[m,axis],
    :, :, axis]) (pointops.py:517-560). Returns (num_out, h, hdim)."""
    if num_out is None:
        num_out = int(index0.max()) + 1
    vm = jnp.take(v, index1, axis=0)                     # (M, h, hdim)
    tm = jnp.take(table, rel_idx, axis=0)                # (M, 3, h, hdim, 3)
    axes = jnp.arange(3)
    tm = jnp.take_along_axis(
        tm, axes[None, :, None, None, None], axis=-1)[..., 0]  # (M, 3, h, hdim)
    pair_val = vm + tm.sum(1)
    contrib = attn[..., None] * pair_val
    flat = contrib.reshape(contrib.shape[0], -1)
    out = segment_sum(flat, index0, num_out)
    return out.reshape(num_out, v.shape[1], v.shape[2])


def grouped_softmax(attn: jnp.ndarray, index0: jnp.ndarray,
                    num_out: int | None = None) -> jnp.ndarray:
    """Softmax over each output point's pair group (the role of the
    reference's per-group softmax between step1 and step2). attn (M, h)."""
    import jax

    if num_out is None:
        num_out = int(index0.max()) + 1
    # per-group max for stability; empty groups yield -inf -> clamp
    gmax = jax.ops.segment_max(attn, index0, num_segments=num_out)
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    e = jnp.exp(attn - jnp.take(gmax, index0, axis=0))
    denom = segment_sum(e, index0, num_out)
    return e / jnp.take(jnp.maximum(denom, 1e-12), index0, axis=0)
