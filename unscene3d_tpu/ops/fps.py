"""Furthest point sampling as a jit-able iterative argmax.

Replaces the reference's pointnet2 CUDA FPS (third_party/pointnet2
sampling_gpu.cu, used for query init at models/mask3d.py:228). Like the
reference kernel, selection starts from index 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def furthest_point_sample(xyz: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """xyz: (N, 3) float, valid: (N,) bool. Returns (k,) int32 indices.

    Invalid (padding) points are never selected as long as at least one valid
    point exists. If a scene has fewer than k valid points, indices repeat
    (harmless for query init; the reference assumes N >= k).
    """
    n = xyz.shape[0]
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    mask_bias = jnp.where(valid, 0.0, neg)

    def body(i, state):
        dist, idxs = state
        last = idxs[i - 1]
        d = jnp.sum(jnp.square(xyz - xyz[last]), axis=-1)
        dist = jnp.minimum(dist, d)
        nxt = jnp.argmax(dist + mask_bias)
        idxs = idxs.at[i].set(nxt.astype(jnp.int32))
        return dist, idxs

    idxs0 = jnp.zeros((k,), jnp.int32)  # start at index 0 like the CUDA kernel
    dist0 = jnp.full((n,), jnp.inf, jnp.float32)
    _, idxs = jax.lax.fori_loop(1, k, body, (dist0, idxs0))
    return idxs


def furthest_point_sample_batch(xyz: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Batched FPS: xyz (B, N, 3), valid (B, N) -> (B, k) int32."""
    return jax.vmap(lambda x, v: furthest_point_sample(x, v, k))(xyz, valid)
