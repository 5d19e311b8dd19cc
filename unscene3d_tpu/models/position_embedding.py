"""Fourier / sine coordinate embeddings (reference models/position_embedding.py:43-180)."""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def shift_scale_points(xyz: jnp.ndarray, src_min: jnp.ndarray, src_max: jnp.ndarray) -> jnp.ndarray:
    """Normalize coords to [0, 1] per scene (reference :12-40).

    xyz: (..., N, 3); src_min/src_max broadcastable to (..., 1, 3).
    """
    diff = jnp.maximum(src_max - src_min, 1e-12)
    return (xyz - src_min) / diff


class PositionEmbeddingCoordsSine(nn.Module):
    """Fourier / sine positional embeddings with per-scene normalization.

    pos_type='fourier': random-Gaussian-projection features; the projection
    matrix is a fixed buffer (reference registers it as a non-trainable
    buffer, :69-71), stored in the 'buffers' collection so the optimizer
    never touches it. pos_type='sine': per-axis sin/cos ramps (:74-126).
    """

    d_pos: int = 128
    gauss_scale: float = 1.0
    normalize: bool = True
    d_in: int = 3
    pos_type: str = "fourier"
    temperature: float = 10000.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, input_min: jnp.ndarray, input_max: jnp.ndarray) -> jnp.ndarray:
        """xyz: (..., N, 3) -> (..., N, d_pos)."""
        assert self.d_pos % 2 == 0
        if self.pos_type == "legacy":
            # PositionalEncoding3D (reference models/mask3d.py:459-488):
            # raw coords, per-axis interleaved-frequency sin/cos, truncated
            return self._legacy(xyz.astype(jnp.float32)).astype(self.dtype)
        x = xyz.astype(jnp.float32)
        if self.normalize:
            x = shift_scale_points(x, input_min, input_max)
        if self.pos_type == "sine":
            return self._sine(x).astype(self.dtype)
        gauss_b = self.variable(
            "buffers",
            "gauss_B",
            lambda: jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                (self.d_in, self.d_pos // 2),
            )
            * self.gauss_scale,
        ).value
        x = x * (2.0 * math.pi)
        proj = jnp.einsum("...nd,de->...ne", x, gauss_b)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1).astype(self.dtype)

    def _legacy(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = int(np.ceil(self.d_pos / 6) * 2)
        if ch % 2:
            ch += 1
        inv_freq = 1.0 / (self.temperature ** (jnp.arange(0, ch, 2, dtype=jnp.float32) / ch))
        embs = []
        for d in range(x.shape[-1]):
            p = x[..., d][..., None] * inv_freq
            embs.append(jnp.concatenate([jnp.sin(p), jnp.cos(p)], axis=-1))
        return jnp.concatenate(embs, axis=-1)[..., : self.d_pos]

    def _sine(self, x: jnp.ndarray) -> jnp.ndarray:
        """Per-axis interleaved sin/cos (reference get_sine_embeddings),
        remainder channels assigned to leading axes in steps of two."""
        d_in = x.shape[-1]
        ndim = self.d_pos // d_in
        if ndim % 2 != 0:
            ndim -= 1
        rems = self.d_pos - ndim * d_in
        outs = []
        for d in range(d_in):
            cdim = ndim + (2 if rems > 0 else 0)
            if rems > 0:
                rems -= 2
            dim_t = jnp.arange(cdim, dtype=jnp.float32)
            dim_t = self.temperature ** (2 * (dim_t // 2) / cdim)
            pos = (x[..., d] * (2.0 * math.pi))[..., None] / dim_t
            emb = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1)
            outs.append(emb.reshape(*pos.shape[:-1], -1))
        return jnp.concatenate(outs, axis=-1)
