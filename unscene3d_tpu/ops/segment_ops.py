"""Deterministic segment reductions (segment_sum/mean/max) on TPU.

These replace the reference's torch_scatter calls (trainer/trainer.py:9,
models/mask3d.py:64-67) and, more broadly, every CUDA atomicAdd in the
reference's native extensions: on TPU a padded segment reduction is both
deterministic and XLA-fusable.

All take an optional `valid` row mask; invalid rows are routed to a trash
segment and dropped, so padded inputs never pollute real segments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _route_invalid(segment_ids, num_segments, valid):
    if valid is None:
        return segment_ids, num_segments
    return jnp.where(valid, segment_ids, num_segments), num_segments + 1


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sum rows of data per segment id. num_segments must be static."""
    ids, total = _route_invalid(segment_ids, num_segments, valid)
    return jax.ops.segment_sum(data, ids, num_segments=total)[:num_segments]


def segment_count(segment_ids: jnp.ndarray, num_segments: int,
                  valid: jnp.ndarray | None = None) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    return segment_sum(ones, segment_ids, num_segments, valid)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean of rows per segment (zeros for empty segments)."""
    s = segment_sum(data, segment_ids, num_segments, valid)
    cnt = segment_count(segment_ids, num_segments, valid).astype(s.dtype)
    return s / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Max of rows per segment; empty segments yield 0 (torch_scatter's
    unfilled default, as relied on by the reference's scatter_type='max')."""
    ids, total = _route_invalid(segment_ids, num_segments, valid)
    out = jax.ops.segment_max(data, ids, num_segments=total)[:num_segments]
    cnt = segment_count(segment_ids, num_segments, valid)
    empty = (cnt == 0)[(...,) + (None,) * (data.ndim - 1)]
    return jnp.where(empty, jnp.zeros_like(out), out)
