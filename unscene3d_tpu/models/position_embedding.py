"""Fourier / sine coordinate embeddings (reference models/position_embedding.py:43-180)."""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def shift_scale_points(xyz: jnp.ndarray, src_min: jnp.ndarray, src_max: jnp.ndarray) -> jnp.ndarray:
    """Normalize coords to [0, 1] per scene (reference :12-40).

    xyz: (..., N, 3); src_min/src_max broadcastable to (..., 1, 3).
    """
    diff = jnp.maximum(src_max - src_min, 1e-12)
    return (xyz - src_min) / diff


class PositionEmbeddingCoordsSine(nn.Module):
    """Fourier-feature positional embedding with per-scene normalization.

    The random Gaussian projection matrix is a fixed buffer (reference
    registers it as a non-trainable buffer, :69-71); we store it in the
    'buffers' collection so the optimizer never touches it.
    """

    d_pos: int = 128
    gauss_scale: float = 1.0
    normalize: bool = True
    d_in: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, input_min: jnp.ndarray, input_max: jnp.ndarray) -> jnp.ndarray:
        """xyz: (..., N, 3) -> (..., N, d_pos)."""
        assert self.d_pos % 2 == 0
        gauss_b = self.variable(
            "buffers",
            "gauss_B",
            lambda: jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                (self.d_in, self.d_pos // 2),
            )
            * self.gauss_scale,
        ).value
        x = xyz.astype(jnp.float32)
        if self.normalize:
            x = shift_scale_points(x, input_min, input_max)
        x = x * (2.0 * math.pi)
        proj = jnp.einsum("...nd,de->...ne", x, gauss_b)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1).astype(self.dtype)
