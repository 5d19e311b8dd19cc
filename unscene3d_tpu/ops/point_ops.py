"""Point-cloud ops: KNN, ball query, grouping, interpolation.

TPU-native equivalents of the reference's CUDA op libraries
(third_party/pointnet2/_ext_src: ball_query/group_points/three_nn/
three_interpolate/sampling; utils/pointops2/functions/pointops.py:10-829 --
the latter is dead code in the reference but listed in its inventory).
Brute-force distance matrices map straight onto the MXU; tops out far beyond
the reference's use sizes (queries ~10^2-10^4). FPS lives in ops/fps.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,3) x (M,3) -> (N,M) squared distances via one GEMM."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    return a2 + b2.T - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def knn_query(query: jnp.ndarray, support: jnp.ndarray, k: int,
              support_valid: jnp.ndarray | None = None):
    """k nearest supports per query (pointops2 KNNQuery, pointops.py:30).
    Returns (idx (N,k) int32, sqdist (N,k))."""
    d = pairwise_sqdist(query, support)
    if support_valid is not None:
        d = jnp.where(support_valid[None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32), -neg_d


@functools.partial(jax.jit, static_argnames=("k",))
def three_nn(query: jnp.ndarray, support: jnp.ndarray, k: int = 3,
             support_valid: jnp.ndarray | None = None):
    """pointnet2 three_nn: 3 nearest supports + distances."""
    return knn_query(query, support, k, support_valid)


def three_interpolate(feats: jnp.ndarray, idx: jnp.ndarray,
                      sqdist: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance-weighted interpolation of support feats (M,C) at
    queries via their 3-NN (pointnet2 three_interpolate, differentiable --
    autodiff supplies the scatter backward of interpolate_gpu.cu)."""
    w = 1.0 / (sqdist + eps)
    w = w / w.sum(-1, keepdims=True)
    g = jnp.take(feats, idx, axis=0)            # (N, k, C)
    return jnp.einsum("nk,nkc->nc", w, g)


@functools.partial(jax.jit, static_argnames=("max_samples",))
def ball_query(query: jnp.ndarray, support: jnp.ndarray, radius: float,
               max_samples: int, support_valid: jnp.ndarray | None = None):
    """Up to max_samples supports within radius per query (pointnet2
    ball_query). CUDA fills remaining slots with the first found index; here
    slots beyond the count replicate the nearest in-radius support.
    Returns (idx (N,S) int32, mask (N,S))."""
    d = pairwise_sqdist(query, support)
    if support_valid is not None:
        d = jnp.where(support_valid[None, :], d, jnp.inf)
    in_r = d <= radius * radius
    k_eff = min(max_samples, support.shape[0])
    # rank by distance but only keep in-radius entries
    neg_d, idx = jax.lax.top_k(jnp.where(in_r, -d, -jnp.inf), k_eff)
    mask = neg_d > -jnp.inf
    if k_eff < max_samples:
        pad = max_samples - k_eff
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    first = idx[:, :1]
    idx = jnp.where(mask, idx, first)
    return idx.astype(jnp.int32), mask


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather support features per group (pointnet2 group_points):
    feats (M,C), idx (N,S) -> (N,S,C)."""
    return jnp.take(feats, idx, axis=0)


def build_trilinear_weights(query_xyz: jnp.ndarray, voxel_size: float):
    """Corner coords + weights for trilinear interpolation of sparse voxel
    features at arbitrary points (custom_cuda_utils trilinear fwd/bwd,
    utils/cuda_utils/cuda_utils_kernel.cu:23-295). Returns
    (corners (N,8,3) int32, weights (N,8))."""
    g = query_xyz / voxel_size - 0.5
    base = jnp.floor(g)
    frac = g - base
    offs = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], jnp.float32
    )
    corners = base[:, None, :] + offs[None]
    w = jnp.prod(
        jnp.where(offs[None] > 0, frac[:, None, :], 1.0 - frac[:, None, :]), axis=-1
    )
    return corners.astype(jnp.int32), w


def trilinear_interpolate(voxel_feats: jnp.ndarray, corner_idx: jnp.ndarray,
                          corner_valid: jnp.ndarray, weights: jnp.ndarray
                          ) -> jnp.ndarray:
    """Interpolate sparse voxel features at query points given host-resolved
    corner indices (hash lookups of build_trilinear_weights corners).
    Missing corners are dropped and weights renormalized. Differentiable."""
    w = weights * corner_valid.astype(weights.dtype)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)
    g = jnp.take(voxel_feats, corner_idx, axis=0)   # (N, 8, C)
    return jnp.einsum("nk,nkc->nc", w, g)
