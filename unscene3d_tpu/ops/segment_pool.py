"""Tile-matmul segment sum (Pallas TPU kernel).

XLA lowers `jax.ops.segment_sum` over a 200k-row level to a scatter-add
that runs ~14x off bandwidth (~1.8ms for a (204800, 128) -> (321, 128)
pool, measured in the round-3 trace). This kernel instead walks the rows
in 128-row tiles and accumulates `onehot(ids)^T @ x_tile` into a
VMEM-resident (S, C) output: one-hot rows contain a single 1, so every
partial product is exact, the accumulation is f32, and the result is
bitwise deterministic. FLOP cost 2*N*S*C runs on the MXU (~0.1ms for the
same pool).

Used for the Mask3D mask-feature segment pooling (models/mask3d.py); the
reference's equivalent is a torch_scatter mean over f32 features
(models/mask3d.py:64-67 in /root/reference), which also accumulates in
f32 -- the XLA segment_sum path it replaces accumulated in bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

T = 128


def _kernel(ids_ref, x_ref, o_ref, *, S, T, out_rows):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    ids = ids_ref[:, 0:1]                                    # (T, 1) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    oh = (ids == iota).astype(x_ref.dtype)                   # (T, S)
    part = jax.lax.dot_general(oh, x_ref[:, :], (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[:] = o_ref[:] + part[:out_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tile_segment_sum(x, ids, num_segments, valid=None):
    """Sum rows of x (N, C) per segment id -> (num_segments, C) in f32
    accumulation, returned in x.dtype. Rows with valid=False (or ids
    outside [0, num_segments)) contribute nothing."""
    return _fwd_impl(x, ids, num_segments, valid)


def _fwd_impl(x, ids, num_segments, valid):
    n, c = x.shape
    if valid is not None:
        ids = jnp.where(valid, ids, -1)
    if jax.default_backend() == "cpu" or n % T:
        from unscene3d_tpu.ops.csr_conv import fallback_active  # noqa: F401
        out = jax.ops.segment_sum(
            x.astype(jnp.float32), jnp.where(ids < 0, num_segments, ids),
            num_segments=num_segments + 1)[:num_segments]
        return out.astype(x.dtype)
    from unscene3d_tpu.ops.csr_conv import fallback_active

    if fallback_active():
        out = jax.ops.segment_sum(
            x.astype(jnp.float32), jnp.where(ids < 0, num_segments, ids),
            num_segments=num_segments + 1)[:num_segments]
        return out.astype(x.dtype)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s_pad = -(-num_segments // 8) * 8
    kernel = functools.partial(_kernel, S=s_pad, T=T, out_rows=s_pad)
    out = pl.pallas_call(
        kernel,
        grid=(n // T,),
        in_specs=[
            pl.BlockSpec((T, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, c), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_pad, c), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, c), jnp.float32),
    )(ids.astype(jnp.int32)[:, None], x)
    return out[:num_segments].astype(x.dtype)


def _vjp_fwd(x, ids, num_segments, valid):
    return _fwd_impl(x, ids, num_segments, valid), (x, ids, valid)


def _vjp_bwd(num_segments, res, g):
    x, ids, valid = res
    ok = (ids >= 0) & (ids < num_segments)
    if valid is not None:
        ok = ok & valid
    safe = jnp.where(ok, ids, 0)
    dx = jnp.take(g, safe, axis=0) * ok[:, None].astype(g.dtype)
    return dx.astype(x.dtype), None, None


tile_segment_sum.defvjp(_vjp_fwd, _vjp_bwd)
