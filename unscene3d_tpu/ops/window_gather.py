"""Generalized windowed-select ops for K-offset cross-level gathers.

Extends the k3 windowed-select conv (ops/window_conv.py) to arbitrary
(K, N_out) index tables into a *different* level's rows -- the k2s2
strided conv, the k2s2 transposed conv, and AvgPooling all reduce to this
shape (reference MinkowskiEngine strided/transposed convs + pooling,
models/modules/common.py:158-185). The jax.profiler trace of the round-3
backbone showed the 8-step lax.scan down-convs at ~10.4 ms each (8-way HBM
row gathers); the windowed form streams one per-tile union window of the
source level and selects rows with one-hot MXU matmuls.

Tables are built from child_idx (down conv / pooling: K=8 children in the
finer level) or from (parent_idx, parent_offset) (transposed conv: K=8
one-hot parents in the coarser level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

T = 256


@struct.dataclass
class WinTables:
    """Window tables for K offsets of out-level rows gathering in-level rows."""

    r0: jnp.ndarray          # (n_tiles,) int32 union start in the IN level
    starts: jnp.ndarray      # (n_tiles, K) int32 sub-window start rel to r0
    lidx: jnp.ndarray        # (n_out_pad, K) int16; -1 = missing / spilled
    spill_out: jnp.ndarray   # (P_s,) int32 out row (sentinel n_out_pad-1)
    spill_in: jnp.ndarray    # (P_s,) int32 in row (sentinel n_in_pad-1)
    spill_k: jnp.ndarray     # (P_s,) int32 offset id in [0, K)
    n_in_pad: int = struct.field(pytree_node=False, default=0)
    w_sub: int = struct.field(pytree_node=False, default=512)
    w_union: int = struct.field(pytree_node=False, default=2048)

    @property
    def num_offsets(self) -> int:
        return self.lidx.shape[1]

    @property
    def num_spill_padded(self) -> int:
        return self.spill_out.shape[0]


def build_win_tables(tables: np.ndarray, n_out_pad: int, n_in_pad: int,
                     w_sub: int | None = None, w_union: int = 2048,
                     spill_pad: int | None = None) -> WinTables:
    """tables: (K, n_out_pad) int indices into the IN level (missing ->
    n_in_pad - 1, always a padding row).

    w_sub=None sizes the per-offset window automatically: the max per-tile
    index span rounded up to 128, capped at 640 and by w_union. UP tables
    (fine out rows <- coarse parents) span only ~tile / density-ratio
    (~80-360 rows measured), so auto width cuts their select FLOPs 2-4x
    with zero spills. DOWN tables span ~tile * ratio (up to ~1900): there
    the cap keeps the select matmuls cheap and the overflow keeps using
    the compact spill fixup, which is cheaper than 1900-wide selects. The
    auto width is a stable function of the level density ratio, so
    recompiles stay rare."""
    tables = np.asarray(tables)
    K = tables.shape[0]
    assert tables.shape[1] == n_out_pad and n_out_pad % T == 0
    w_union = min(int(w_union), n_in_pad)
    n_tiles = n_out_pad // T
    tile_of = np.arange(n_out_pad) // T
    BIG = np.int64(1 << 40)

    lo_k = np.empty((K, n_tiles), np.int64)
    hi_k = np.full((K, n_tiles), -1, np.int64)
    valid_k = []
    for k in range(K):
        idx = tables[k].astype(np.int64)
        valid = idx != (n_in_pad - 1)
        valid_k.append(valid)
        per_tile = np.where(valid, idx, BIG).reshape(n_tiles, T)
        lo = per_tile.min(axis=1)
        lo_k[k] = np.where(lo == BIG, BIG, lo & ~7)
        hi_k[k] = np.where(valid, idx, -1).reshape(n_tiles, T).max(axis=1)
    if w_sub is None:
        span = np.where(hi_k >= 0, hi_k - np.where(lo_k == BIG, 0, lo_k) + 1,
                        0).max()
        w_sub = int(min(max(-(-int(span) // 128) * 128, 128), 640, w_union))
    else:
        w_sub = min(int(w_sub), w_union)
    r0 = lo_k.min(axis=0)
    r0 = np.clip(np.where(r0 == BIG, 0, r0), 0, n_in_pad - w_union)

    starts = np.zeros((n_tiles, K), np.int32)
    lidx = np.full((n_out_pad, K), -1, np.int16)
    sp_out, sp_in, sp_k = [], [], []
    for k in range(K):
        idx = tables[k].astype(np.int64)
        valid = valid_k[k]
        lo = np.where(lo_k[k] == BIG, r0, lo_k[k])
        lo = np.clip(lo, r0, r0 + w_union - w_sub)
        starts[:, k] = (lo - r0).astype(np.int32)
        rel = idx - lo[tile_of]
        ok = valid & (rel >= 0) & (rel < w_sub)
        lidx[ok, k] = rel[ok].astype(np.int16)
        bad = valid & ~ok
        if bad.any():
            rows = np.nonzero(bad)[0]
            sp_out.append(rows.astype(np.int32))
            sp_in.append(idx[rows].astype(np.int32))
            sp_k.append(np.full(len(rows), k, np.int32))

    from unscene3d_tpu.ops.sparse_graph import bucket_size

    n_spill = sum(len(a) for a in sp_out)
    if spill_pad is None:
        spill_pad = bucket_size(n_spill, align=8, min_size=8) if n_spill else 0
    if spill_pad < n_spill:
        from unscene3d_tpu.ops.window_conv import SpillPlanExceeded

        raise SpillPlanExceeded(
            f"spill bucket {spill_pad} < {n_spill}",
            needed={"win_spill_k": n_spill})
    out = np.full(spill_pad, n_out_pad - 1, np.int32)
    inn = np.full(spill_pad, n_in_pad - 1, np.int32)
    kk = np.zeros(spill_pad, np.int32)
    if n_spill:
        # sorted by out row so the fixup's segment_sum skips the device
        # sort XLA otherwise inserts for scatter-adds (the sentinel padding
        # rows at n_out_pad-1 keep the order sorted)
        o = np.concatenate(sp_out)
        order = np.argsort(o, kind="stable")
        out[:n_spill] = o[order]
        inn[:n_spill] = np.concatenate(sp_in)[order]
        kk[:n_spill] = np.concatenate(sp_k)[order]
    # numpy, not jnp: see build_win_graph -- no eager device transfers from
    # collate threads; the batch is device_put once as a tree
    return WinTables(
        r0=r0.astype(np.int32),
        starts=starts, lidx=lidx,
        spill_out=out, spill_in=inn,
        spill_k=kk, n_in_pad=int(n_in_pad),
        w_sub=int(w_sub), w_union=int(w_union),
    )


def up_tables_from_parents(parent_idx: np.ndarray, parent_offset: np.ndarray,
                           valid: np.ndarray, n_in_pad: int) -> np.ndarray:
    """(8, N_fine) tables for the transposed conv: row i gathers its parent
    under offset table parent_offset[i], missing elsewhere."""
    n = len(parent_idx)
    tables = np.full((8, n), n_in_pad - 1, np.int32)
    rows = np.nonzero(valid)[0]
    tables[parent_offset[rows], rows] = parent_idx[rows]
    return tables


def _kernel_k(r0_ref, starts_ref, lidx_ref, x_any, *rest,
              K, W, WU, has_w, out_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = 0
    w_ref = None
    if has_w:
        w_ref = rest[i]
        i += 1
    valid_ref, o_ref, scratch, sems = rest[i], rest[i + 1], rest[i + 2], rest[i + 3]

    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def dma(slot, tt):
        r0 = pl.multiple_of(r0_ref[tt], 8)
        return pltpu.make_async_copy(
            x_any.at[pl.ds(r0, WU)], scratch.at[slot], sems.at[slot])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()
    slot = t % 2
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    acc = None
    for k in range(K):
        u = pl.multiple_of(starts_ref[t * K + k], 8)
        sub = scratch.at[slot][pl.ds(u, W), :]
        li = lidx_ref[:, k:k + 1].astype(jnp.int32)
        onehot = (li == iota).astype(sub.dtype)
        g = jnp.dot(onehot, sub, preferred_element_type=jnp.float32)
        if has_w:
            g = jnp.dot(g.astype(sub.dtype), w_ref[k],
                        preferred_element_type=jnp.float32)
        acc = g if acc is None else acc + g
    acc = acc * valid_ref[:, 0][:, None].astype(jnp.float32)
    o_ref[:] = acc.astype(out_dtype)


def _spill_contrib(x, w, wt: WinTables, n_out_pad, cout):
    if int(wt.num_spill_padded) == 0:
        return None
    xs = jnp.take(x, wt.spill_in, axis=0)
    if w is None:
        acc = xs.astype(jnp.float32)
    else:
        # one (P, K*Cin) x (K*Cin, Cout) matmul: a loop of K masked small
        # dots gets lowered as HLO convolutions (~10x off, trace r3)
        K, cin, cout_w = w.shape
        oh = jax.nn.one_hot(wt.spill_k, K, dtype=xs.dtype)       # (P, K)
        spread = (oh[:, :, None] * xs[:, None, :]).reshape(
            xs.shape[0], K * cin)
        acc = jnp.dot(spread, w.reshape(K * cin, cout_w),
                      preferred_element_type=jnp.float32)
    return jax.ops.segment_sum(acc, wt.spill_out, num_segments=n_out_pad,
                               indices_are_sorted=True)


def _xla_reference(x, w, wt: WinTables, out_valid, n_out_pad):
    tile_of = jnp.arange(n_out_pad) // T
    base = jnp.take(wt.r0, tile_of)
    K = wt.num_offsets
    acc = None
    for k in range(K):
        li = wt.lidx[:, k].astype(jnp.int32)
        rows = base + jnp.take(wt.starts[:, k], tile_of) + li
        rows = jnp.where(li >= 0, rows, wt.n_in_pad - 1)
        g = jnp.take(x, rows, axis=0)
        g = (g * (li >= 0)[:, None].astype(x.dtype)).astype(jnp.float32)
        if w is not None:
            g = jnp.dot(g.astype(x.dtype), w[k],
                        preferred_element_type=jnp.float32)
        acc = g if acc is None else acc + g
    sp = _spill_contrib(x, w, wt, n_out_pad,
                        acc.shape[-1])
    if sp is not None:
        acc = acc + sp
    return (acc * out_valid[:, None].astype(jnp.float32)).astype(x.dtype)


def window_k_apply(x: jnp.ndarray, w: jnp.ndarray | None, wt: WinTables,
                   out_valid: jnp.ndarray, n_out_pad: int) -> jnp.ndarray:
    """out[i] = sum_k x[table_k[i]] (@ w[k] if w given), masked to out_valid.
    x: (n_in_pad, Cin); w: (K, Cin, Cout) or None (pooling SUM)."""
    n_in_pad, cin = x.shape
    assert n_in_pad == wt.n_in_pad, (n_in_pad, wt.n_in_pad)
    cout = cin if w is None else w.shape[-1]
    from unscene3d_tpu.ops.csr_conv import fallback_active

    if jax.default_backend() == "cpu" or fallback_active():
        return _xla_reference(x, None if w is None else w.astype(x.dtype),
                              wt, out_valid, n_out_pad)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from unscene3d_tpu.ops.window_conv import _VMEM_CEILING, _vmem_params

    K, W, WU = wt.num_offsets, wt.w_sub, wt.w_union
    cpad = -(-cin // 128) * 128
    has_w = w is not None
    # self-sizing VMEM (see window_conv._fwd_vmem_bytes): scratch + weights
    # + blocked windows + select temporaries
    itemsize = x.dtype.itemsize
    est = (2 * WU * cpad * itemsize                       # union double-buf
           + (8 * cpad * cout * itemsize if has_w else 0)  # weights
           + 2 * T * (K * 2 + 1)                           # lidx + valid
           + 2 * T * max(cout, cpad) * itemsize            # out window
           + 2 * T * W * 4 + 2 * T * cpad * 4 + 2 * T * cout * 4)
    if est > _VMEM_CEILING:
        return _xla_reference(x, None if w is None else w.astype(x.dtype),
                              wt, out_valid, n_out_pad)
    xp = x if cpad == cin else jnp.pad(x, ((0, 0), (0, cpad - cin)))

    in_specs = [
        pl.BlockSpec((T, K), lambda t, r, s: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    args = [wt.lidx, xp]
    if has_w:
        wk = w.astype(x.dtype)
        wp = wk if cpad == cin else jnp.pad(wk, ((0, 0), (0, cpad - cin),
                                                (0, 0)))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(wp)
        out_w = cout
    else:
        out_w = cpad
    in_specs.append(pl.BlockSpec((T, 1), lambda t, r, s: (t, 0),
                                 memory_space=pltpu.VMEM))
    args.append(out_valid.astype(jnp.int8)[:, None])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_out_pad // T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, out_w), lambda t, r, s: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WU, cpad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_k, K=K, W=W, WU=WU, has_w=has_w,
                               out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_pad, out_w), x.dtype),
        compiler_params=_vmem_params(est),
    )(wt.r0, wt.starts.reshape(-1), *args)
    if not has_w and cpad != cin:
        out = out[:, :cin]

    sp = _spill_contrib(x, None if w is None else w.astype(x.dtype), wt,
                        n_out_pad, cout)
    if sp is not None:
        out = (out.astype(jnp.float32) + sp
               ) * out_valid[:, None].astype(jnp.float32)
        out = out.astype(x.dtype)
    return out
