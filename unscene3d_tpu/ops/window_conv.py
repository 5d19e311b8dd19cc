"""Windowed-select k3 sparse convolution (Pallas TPU kernel).

The round-2 engine was bound by HBM row gathers (~0.3 Grows/s on this chip,
docs/DESIGN.md). This kernel removes them: levels are sorted by the
(b, x, y, z) ravel key (ops/hashing.py), so for ANY k3 offset the neighbors
of a 256-row out-tile lie in a small contiguous index window -- the farthest
class (dx = +-1, the slowest sort dim) spans one x-slice's occupancy, ~500
rows on a 200k-voxel ScanNet-like scene (benchmarks/measure_spans.py).

Per grid step (one supertile of `group` consecutive out-tiles):
  1. ONE sliding union window of x rows is DMA'd HBM->VMEM at streaming
     bandwidth, double-buffered across steps and shared by the group's
     tiles (read amplification w_union / (group*tile) ~ 2.9);
  2. per tile, one sub-window is sliced from the union per dx REGION
     (dx=-1 slice / own rows / dx=+1 slice; region = offset//9) and each
     of the 26 non-center offsets selects its neighbor rows from its
     region's slice by a one-hot (T x W) matmul on the MXU -- exact 0/1
     row selection, fully deterministic;
  3. the 27 offset GEMMs accumulate in f32; spilled pairs (neighbor
     outside the region window, <0.5%) fold in from a compact
     scalar-prefetch-indexed table; bias / BN scale-shift / residual /
     ReLU / validity masking fuse into the epilogue.

Pair tables are int16 window-local indices (half the pair-table bytes);
all scalar-prefetch tables are flat 1-D (2-D SMEM layouts pad ~512B per
row, docs/DESIGN.md).

Reference being replaced: MinkowskiEngine's gather-GEMM-scatter CUDA conv
(models/modules/common.py:125-158 in /root/reference).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

T = 256          # default out rows per grid step (see WinGraph.tile)


class SpillPlanExceeded(AssertionError):
    """A batch's realized spill tables outgrew the master pad plan.

    Subclasses AssertionError so existing grow-and-recollate catches keep
    working; carries the realized requirement so the plan rebuild can take
    max(probe, realized) instead of re-probing blind (VERDICT r4 next#2:
    spill counts are MAX statistics of a spiky distribution -- a fresh probe
    can under-size again and crash training mid-epoch).

    needed: dict of plan floors, e.g. {"win_spill": {2: (p_rows, q_len)}}
    (level -> realized requirement; kind names match the pad-plan keys)."""

    def __init__(self, msg: str, needed: dict | None = None):
        super().__init__(msg)
        self.needed = needed or {}

# CI runs on CPU, where the conv router takes the XLA-reference branch and
# the Pallas kernels never lower -- which is exactly how two round-3 kernel
# bugs shipped green (ADVICE.md r3). pallas_interpret() forces the Pallas
# path through the interpreter so CPU tests exercise the real kernel bodies
# (packed select, grouped loop, spill inject, dW prefetch layout).
_INTERPRET = [False]


@contextlib.contextmanager
def pallas_interpret():
    _INTERPRET.append(True)
    try:
        yield
    finally:
        _INTERPRET.pop()


def interpret_active() -> bool:
    return _INTERPRET[-1]


# Mosaic's default scoped-VMEM budget is 16M; v5e/v5p cores have 128M of
# physical VMEM. The flagship f32 train step's 256-in-channel levels need
# ~20M of scratch+temporaries (VERDICT r4 missing#1: batch-8 training never
# compiled), so the kernels below SIZE THEMSELVES: estimate the footprint
# from (WU, tile, group, cpad, cout, dtype), raise the limit when the
# default would overflow, and fall back to the XLA formulation when even
# the physical budget cannot fit.
_VMEM_DEFAULT = 16 * 1024 * 1024
_VMEM_CEILING = 100 * 1024 * 1024   # leave headroom under the 128M physical


def _fwd_vmem_bytes(*, WU, WS, G, T, PACK, cpad, cout, itemsize, SQ,
                    has_res, spill_rows) -> int:
    """Upper-bound estimate of the forward kernel's VMEM footprint."""
    scratch = 2 * (WU // PACK) * cpad * itemsize          # union double-buf
    blocked = 2 * (G * T) * (26 * 2 + 1)                  # lidx + valid
    blocked += 2 * (G * T) * cout * itemsize              # out window
    if has_res:
        blocked += 2 * (G * T) * cout * itemsize
    resident = 27 * cpad * cout * itemsize                # weights
    resident += 2 * 4 * cout                              # scale/shift
    if SQ:
        resident += spill_rows * (cout + 1) * 4           # spill table
        scratch += T * cout * 4                           # acc_sc
        # iotas (SQ,T) x2 int32 + one-hot + tab slice temporaries
        resident += SQ * T * 12 + SQ * (cout + 1) * 4
    # select temporaries: one-hot (T, W) + selected rows (T, cpad) f32 +
    # acc/y (T, cout) f32; Mosaic keeps a couple of copies live
    temp = 2 * T * (max(WS) // PACK) * 4 + 2 * T * cpad * 4 + 3 * T * cout * 4
    return scratch + blocked + resident + temp


def _dw_vmem_bytes(*, WU, WS, G, T, cpad, cout, itemsize) -> int:
    scratch = 2 * WU * cpad * itemsize
    out_acc = 26 * cpad * cout * 4                        # VMEM-resident dW
    blocked = 2 * (G * T) * (26 * 2) + 2 * (G * T) * cout * itemsize
    temp = 2 * T * max(WS) * 4 + 2 * T * cpad * 4 + T * cout * 4
    return scratch + out_acc + blocked + temp


def _vmem_params(est: int):
    """CompilerParams raising the scoped-VMEM cap to fit `est` (with
    margin), or None when the default 16M budget already fits."""
    from jax.experimental.pallas import tpu as pltpu

    # GENEROUS margin: the limit is a permission cap, not an allocation --
    # Mosaic only uses what the kernel needs, so overshooting costs nothing
    # while undershooting kills the whole compile. Measured worst case:
    # est 31.6M vs actual scoped stack 41.86M (1.32x) on the f32 256->384
    # dx kernel at T=256/G=8 (Mosaic pipelines the 26-offset select loop
    # deeper than the 2-copy liveness model assumes).
    need = int(est * 1.6)
    if need <= _VMEM_DEFAULT:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(max(need, 48 * 1024 * 1024), _VMEM_CEILING))


@struct.dataclass
class WinGraph:
    """Window tables of one level's k3 topology (non-center offsets).

    Spilled pairs (neighbor outside the per-offset sub-window, <0.5%
    measured) live in a COMPACT table sorted by out tile: tile t's pairs
    occupy slots [sp_q0[t], sp_q0[t] + sp_qn[t]), segments 8-aligned so the
    kernel can slice them at a provably-aligned dynamic start. Per-tile
    spill counts are heavily spiked (a handful of x-slice-span-outlier
    tiles own ~90% of the spills), so a padded per-tile layout would blow
    the table up ~100x; the compact layout plus a pl.when-guarded in-kernel
    inject keeps both the table and the MXU cost proportional to REAL
    spills."""

    r0: jnp.ndarray          # (n_super,) int32 union-window start row
    starts: jnp.ndarray      # (n_tiles, 3) int32 REGION window start rel to
    #                          r0; region = offset dx+1 = k//9 (dx=-1 slice,
    #                          own rows, dx=+1 slice). Offsets within a
    #                          region share one sub-window slice -- 3 SMEM
    #                          scalars + 3 dynamic slices per tile instead
    #                          of 26 (26 per-offset starts at tile=128
    #                          overflow the 1M SMEM scalar budget)
    lidx: jnp.ndarray        # (n_pad, 26) int16 neighbor idx rel to the
    #                          offset's REGION start; -1 = missing / spilled
    spill_out: jnp.ndarray   # (P8,) int32 out row (sentinel n_pad-1)
    spill_in: jnp.ndarray    # (P8,) int32 in row (sentinel n_pad-1)
    spill_k: jnp.ndarray     # (P8,) int32 offset id in [0, 27)
    spill_rows: jnp.ndarray  # (P8,) int32 out row rel OWN tile start; -1
    sp_q0: jnp.ndarray       # (n_tiles,) int32 8-aligned, in-bounds-clamped
    #                          kernel slice start
    sp_qn: jnp.ndarray       # (n_tiles, 2) int32 [qa, qb): tile's own pair
    #                          range RELATIVE to the sp_q0 slice
    w_subs: tuple = struct.field(pytree_node=False, default=())
    #                          ^ per-region widths (W_dx-, W_own, W_dx+);
    #                            empty = uniform w_sub for all three
    w_sub: int = struct.field(pytree_node=False, default=512)
    w_union: int = struct.field(pytree_node=False, default=2304)
    group: int = struct.field(pytree_node=False, default=1)
    tile: int = struct.field(pytree_node=False, default=256)
    spill_q: int = struct.field(pytree_node=False, default=0)
    #                          ^ static kernel slice length: max 8-aligned
    #                            per-tile segment (0 = no spills)

    @property
    def num_spill_padded(self) -> int:
        return self.spill_out.shape[0]


def build_win_graph(nbr_idx: np.ndarray, n_pad: int, w_sub: int = 384,
                    w_union: int = 4096,
                    spill_plan: tuple | None = None,
                    group: int = 1, tile: int = T) -> WinGraph:
    """Build window tables from a (27, n_pad) k3 neighbor map (missing ->
    n_pad-1, the always-padding row). Vectorized numpy; the center offset
    (13) is streamed directly by the kernel and not tabled.

    w_union is clamped to n_pad (small levels are whole-level resident).
    The union start r0 per tile is data-dependent: the dx=+-1 offsets sit
    one x-slice away in the sort order, so the union must span roughly two
    slice occupancies + w_sub (measured 3.3k rows max on the 200k bench
    scene).

    group=G amortizes ONE union-window DMA over G consecutive tile-row out
    tiles (the kernel's per-tile read amplification is w_union/tile;
    grouping divides it by ~G since consecutive tiles' unions overlap
    almost entirely). Selects stay per-tile, so MXU work is unchanged.
    Requires n_pad % (G*tile) == 0; w_union must additionally cover the
    extra (G-1)*tile rows of in-group drift.

    tile=256 with a uniform w_sub=384 is the measured optimum on the dev
    chip: tile=128 + per-region widths (192, 288) cuts select FLOPs 1.5x
    but LOSES end-to-end (8.7 vs 7.9 ms on the L0 A/B, benchmarks notes in
    docs/DESIGN.md) to per-matmul and loop overheads, and per-offset
    starts at tile=128 overflow SMEM -- hence the 3-region start layout."""
    nbr_idx = np.asarray(nbr_idx)
    assert nbr_idx.shape[0] == 27 and nbr_idx.shape[1] == n_pad
    group, tile = int(group), int(tile)
    ks = [k for k in range(27) if k != 13]
    # w_sub may be one width or per-region widths (W_own, W_dx): offsets
    # share a window per dx class (region = k//9: dx=-1 slice / own rows /
    # dx=+1 slice). The window floor is ~tile + sort-order drift; the own
    # region's drift is small (dy/dz steps) while the dx regions span one
    # x-slice's occupancy spread, so (192, 288) at tile=128 cuts the select
    # matmul FLOPs ~1.5x vs a uniform 384 at tile=256
    if isinstance(w_sub, (tuple, list)):
        wo, wx = (min(int(v), n_pad) for v in w_sub[:2])
        w_reg = (wx, wo, wx)
    else:
        w = min(int(w_sub), n_pad)
        w_reg = (w, w, w)
    w_union = min(int(w_union), n_pad)
    # center containment: every supertile's own G*tile rows must sit inside
    # its union window (the kernels stream the center offset from the union
    # scratch at row tile_start - r0, and the r0 clip below assumes
    # send - w_union <= sstart). group*tile > w_union would make those
    # center reads run PAST the DMA'd window -- silently wrong forward/dx
    # (deterministic wrong rows) and NaN dW from uninitialized VMEM.
    # Grouping is purely a DMA-amortization knob, so degrade it instead of
    # corrupting; production plans (ops/kernel_maps.py) already add
    # (g-1)*tile to w_union and never trip this.
    while group > 1 and group * tile > w_union:
        group //= 2
    assert group * tile <= w_union, (group, tile, w_union)
    assert n_pad % (tile * group) == 0 and n_pad >= w_union >= max(w_reg)
    # r0 and the region starts are 32-aligned so the PACKED kernel path
    # (4 rows folded into 128 lanes for narrow-channel convs) can slice at
    # provably 8-aligned packed offsets; all clip bounds below are
    # multiples of 32 iff w_union/w_sub are, so the align-down is a no-op
    # and cannot push the union off the supertile's own rows
    assert w_union % 32 == 0 and tile % 32 == 0
    assert all(w % 32 == 0 for w in w_reg)
    # own-region window must be able to CONTAIN a full tile (the packed
    # kernel streams the center offset through it); both containment clamps
    # below are satisfiable iff w_own >= tile
    assert w_reg[1] >= tile, (w_reg, tile)
    n_tiles = n_pad // tile
    n_super = n_tiles // group
    tile_of = np.arange(n_pad) // tile
    super_of_tile = np.arange(n_tiles) // group

    BIG = np.int64(1 << 40)
    # per (tile, region) aligned window starts, then the union start
    # (single-sweep C++ when available: the numpy loop costs ~0.6s/scene on
    # the 200k bench scene, benchmarks/profile_collate.py)
    from unscene3d_tpu.native import win_tables_native

    lo_reg = win_tables_native(nbr_idx, n_pad, tile)
    if lo_reg is None:
        lo_reg = np.full((3, n_tiles), BIG, np.int64)
        for k in ks:
            idx = nbr_idx[k].astype(np.int64)
            valid = idx != (n_pad - 1)
            per_tile = np.where(valid, idx, BIG).reshape(n_tiles, tile)
            lo = per_tile.min(axis=1)
            r = k // 9
            lo_reg[r] = np.minimum(lo_reg[r],
                                   np.where(lo == BIG, BIG, lo & ~31))
    tstart = np.arange(n_tiles, dtype=np.int64) * tile
    r0_tile = lo_reg.min(axis=0)
    r0_tile = np.where(r0_tile == BIG, tstart, r0_tile)
    # union start per SUPER tile (group of G tiles): low enough for every
    # member tile's offsets, high enough that the last member's own rows
    # stay inside (the center offset streams from the union); offsets
    # pushed out of coverage spill instead
    sstart = tstart.reshape(n_super, group)[:, 0]
    send = sstart + group * tile                              # rows end
    r0 = r0_tile.reshape(n_super, group).min(axis=1)
    r0 = np.clip(r0, send - w_union, sstart)
    r0 = np.clip(r0, 0, n_pad - w_union) & ~31

    r0_of_tile = r0[super_of_tile]
    starts = np.zeros((n_tiles, 3), np.int32)
    lo_of = np.empty((3, n_tiles), np.int64)
    for r in range(3):
        lo = np.where(lo_reg[r] == BIG, r0_of_tile, lo_reg[r])
        lo = np.clip(lo, r0_of_tile, r0_of_tile + w_union - w_reg[r])
        if r == 1:
            # the own-region window must CONTAIN the tile's own rows
            # [tstart, tstart+tile): the packed kernel streams the center
            # offset through it, so lo must satisfy BOTH
            # lo <= tstart (cover the tile START -- r3 only forced the end,
            # silently zeroing the center term for leading rows whenever the
            # min valid dx=0 neighbor sat >= w_own-tile rows above tstart)
            # and lo + w_own >= tstart + tile (cover the tile END).
            # Neighbor pairs pushed out by these clamps spill instead. The
            # interval is non-empty given w_own >= tile (asserted above),
            # r0 <= sstart <= tstart and tstart + tile <= send <= r0+w_union.
            lo = np.maximum(lo, tstart + tile - w_reg[1])
            lo = np.minimum(lo, tstart)
        starts[:, r] = (lo - r0_of_tile).astype(np.int32)
        lo_of[r] = lo
    from unscene3d_tpu.native import win_fill_lidx_native

    filled = win_fill_lidx_native(nbr_idx, n_pad, tile, lo_of, w_reg)
    if filled is not None:
        lidx, all_out, all_in, all_k = filled
        sp_out = [all_out] if len(all_out) else []
        sp_in, sp_k = [all_in], [all_k]
    else:
        lidx = np.full((n_pad, 26), -1, np.int16)
        sp_out, sp_in, sp_k = [], [], []
        for ki, k in enumerate(ks):
            idx = nbr_idx[k].astype(np.int64)
            valid = idx != (n_pad - 1)
            r = k // 9
            rel = idx - lo_of[r][tile_of]
            ok = valid & (rel >= 0) & (rel < w_reg[r])
            lidx[ok, ki] = rel[ok].astype(np.int16)
            bad = valid & ~ok
            if bad.any():
                rows = np.nonzero(bad)[0]
                sp_out.append(rows.astype(np.int32))
                sp_in.append(idx[rows].astype(np.int32))
                sp_k.append(np.full(len(rows), k, np.int32))

    # compact tile-sorted spill packing: tile t's pairs at 8-aligned slots
    # [q0[t], q0[t]+qn[t]); the kernel folds tile t's segment in with ONE
    # (qn-guarded) transposed-one-hot matmul so residual/ReLU stay fused
    # in-kernel, and the table stays proportional to REAL spills (a padded
    # per-tile layout paid the worst tile's count for every tile)
    n_spill = sum(len(a) for a in sp_out)
    if n_spill:
        all_out = np.concatenate(sp_out)
        all_in = np.concatenate(sp_in)
        all_k = np.concatenate(sp_k)
        t_of = all_out // tile
        counts = np.bincount(t_of, minlength=n_tiles)
    else:
        counts = np.zeros(n_tiles, np.int64)
    seg = -(-counts // 8) * 8                                # aligned lens
    q0 = np.concatenate([[0], np.cumsum(seg)[:-1]])
    q_need = int(seg.max()) if n_spill else 0
    p_need = int(seg.sum())
    if spill_plan is None:
        spill_q, p8 = q_need, p_need
    else:
        p8, spill_q = int(spill_plan[0]), int(spill_plan[1])
    if spill_q < q_need or p8 < p_need:
        raise SpillPlanExceeded(
            f"spill plan ({p8}, {spill_q}) < needed ({p_need}, {q_need})",
            needed={"win_spill": (p_need, q_need)})
    # the kernel slices [q0c, q0c + spill_q) with q0c clamped in-bounds;
    # tile t's own pairs sit at relative slots [qa, qb) inside the slice
    # (the slice may overlap neighboring tiles' segments, which the kernel
    # masks out by this range)
    P = max(p8, spill_q) if (n_spill or p8 or spill_q) else 0
    q0c = np.minimum(q0, max(P - spill_q, 0))
    qa = q0 - q0c
    qb = qa + counts
    out = np.full(P, n_pad - 1, np.int32)
    inn = np.full(P, n_pad - 1, np.int32)
    kk = np.zeros(P, np.int32)
    rows = np.full(P, -1, np.int32)
    if n_spill:
        order = np.argsort(t_of, kind="stable")
        rank = np.arange(n_spill) - np.concatenate(
            [[0], np.cumsum(counts)[:-1]])[t_of[order]]
        slots = q0[t_of[order]] + rank
        out[slots] = all_out[order]
        inn[slots] = all_in[order]
        kk[slots] = all_k[order]
        rows[slots] = (all_out[order] - t_of[order] * tile).astype(np.int32)
    # tables stay numpy: collate runs on host threads/processes, and eager
    # jnp.asarray here would serialize a device transfer per table into the
    # collate critical path (the batch is device_put once, as a tree)
    return WinGraph(
        r0=r0.astype(np.int32),
        starts=starts, lidx=lidx,
        spill_out=out, spill_in=inn,
        spill_k=kk, spill_rows=rows,
        sp_q0=q0c.astype(np.int32),
        sp_qn=np.stack([qa, qb], 1).astype(np.int32),
        w_subs=tuple(int(w) for w in w_reg),
        w_sub=int(max(w_reg)), w_union=int(w_union),
        group=group, tile=tile, spill_q=int(spill_q),
    )


def _kernel(*refs, T, WS, WU, G, SQ, n_pad, relu, out_dtype, has_scale,
            has_res, PACK=1):
    PACK_SH = PACK.bit_length() - 1
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q0_ref = qn_ref = tab_ref = None
    if SQ:
        r0_ref, starts_ref, q0_ref, qn_ref = refs[:4]
        rest = refs[4:]
    else:
        r0_ref, starts_ref = refs[:2]
        rest = refs[2:]
    lidx_ref, x_any, w_ref = rest[:3]
    i = 3
    scale_ref = shift_ref = res_ref = None
    if SQ:
        tab_ref = rest[i]
        i += 1
    if has_scale:
        scale_ref, shift_ref = rest[i], rest[i + 1]
        i += 2
    if has_res:
        res_ref = rest[i]
        i += 1
    valid_ref, o_ref = rest[i], rest[i + 1]
    scratch, sems = rest[i + 2], rest[i + 3]
    acc_sc = rest[i + 4] if SQ else None

    t = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def dma(slot, tt):
        r0 = pl.multiple_of(r0_ref[tt] // PACK, 8)
        return pltpu.make_async_copy(
            x_any.at[pl.ds(r0, WU // PACK)], scratch.at[slot],
            sems.at[slot])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < n_steps)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()
    slot = t % 2
    iotas = [jax.lax.broadcasted_iota(jnp.int32, (T, w // PACK), 1)
             for w in WS]
    if PACK > 1:
        # lane-block id of every 128-lane column (PACK row-blocks of the
        # packed layout, each 128/PACK channels wide)
        lane_blk = (jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
                    // (128 // PACK))
        rowi = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)

    # fori_loop (not an unrolled python loop) so Mosaic reuses the per-g
    # select temporaries: unrolled G>1 overflows the 16M scoped-VMEM stack
    def per_tile(g, _):
        gT = pl.multiple_of(g * T, T)
        # one sub-window slice per dx region, shared by its 8-9 offsets
        subs = []
        for r in range(3):
            u = pl.multiple_of(
                starts_ref[(t * G + g) * 3 + r] // PACK, 8)
            subs.append(scratch.at[slot][pl.ds(u, WS[r] // PACK), :])

        def select(li, reg):
            """Select neighbor rows given window-local ids (T, 1)."""
            sub = subs[reg]
            if PACK == 1:
                onehot = (li == iotas[reg]).astype(sub.dtype)  # exact 0/1
                sel = jnp.dot(onehot, sub,
                              preferred_element_type=jnp.float32)
                return sel.astype(sub.dtype)
            # packed: pick the 128-lane super-row, then mask the lane
            # block holding the neighbor's channels; the stacked weights
            # (w tiled PACK x along cin) absorb the block offset, so the
            # apply GEMM below is unchanged
            onehot = ((li >> PACK_SH) == iotas[reg]).astype(sub.dtype)
            sel = jnp.dot(onehot, sub, preferred_element_type=jnp.float32)
            sel = sel * ((li & (PACK - 1)) == lane_blk).astype(jnp.float32)
            return sel.astype(sub.dtype)

        if PACK == 1:
            c0 = pl.multiple_of(
                (t * G + g) * T - pl.multiple_of(r0_ref[t], 8), 8)
            xc = scratch.at[slot][pl.ds(c0, T), :]
        else:
            # the center offset's rows come through the same packed select
            # (own-region window); its window-local ids are just the row
            # index plus the tile-start-to-window-start distance
            c_off = ((t * G + g) * T
                     - (r0_ref[t] + starts_ref[(t * G + g) * 3 + 1]))
            xc = select(rowi + c_off, 1)
        acc = jnp.dot(xc, w_ref[13], preferred_element_type=jnp.float32)
        for ki in range(26):
            k = ki if ki < 13 else ki + 1
            li = lidx_ref[pl.ds(gT, T), ki:ki + 1].astype(jnp.int32)
            acc = acc + jnp.dot(select(li, k // 9), w_ref[k],
                                preferred_element_type=jnp.float32)
        if SQ:
            # spilled pairs: precomputed per-pair x[i]@w[k] values live in a
            # COMPACT tile-sorted table (last column = out row rel tile
            # start); fold tile g's segment in with one guarded transposed
            # one-hot matmul so the nonlinear epilogue stays fused in-kernel
            cout = o_ref.shape[-1]
            ti = t * G + g
            acc_sc[:] = acc

            @pl.when(qn_ref[2 * ti + 1] > 0)
            def _():
                q0 = pl.multiple_of(q0_ref[ti], 8)
                tab = tab_ref[pl.ds(q0, SQ), :]              # (SQ, cout+1)
                spv = tab[:, 0:cout]
                rows = tab[:, cout:cout + 1]                 # (SQ, 1) f32
                iq = jax.lax.broadcasted_iota(jnp.int32, (SQ, T), 0)
                it = jax.lax.broadcasted_iota(jnp.int32, (SQ, T), 1)
                inseg = ((iq >= qn_ref[2 * ti]) &
                         (iq < qn_ref[2 * ti + 1]))
                ohT = jnp.where(inseg & (rows.astype(jnp.int32) == it),
                                1.0, 0.0)
                # HIGHEST: default MXU precision rounds the injected f32
                # per-pair values to ~bf16 (0.2-0.4% rel error on exactly
                # the spilled rows); SQ is tiny so the cost is negligible
                inj = jax.lax.dot_general(
                    ohT, spv, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # (T, cout)
                acc_sc[:] = acc_sc[:] + inj

            acc = acc_sc[:]
        y = acc
        if has_scale:
            y = y * scale_ref[0, :] + shift_ref[0, :]
        if has_res:
            y = y + res_ref[pl.ds(gT, T), :].astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        y = y * valid_ref[pl.ds(gT, T), 0][:, None].astype(jnp.float32)
        o_ref[pl.ds(gT, T), :] = y.astype(out_dtype)
        return 0

    if G == 1:
        per_tile(0, 0)
    else:
        jax.lax.fori_loop(0, G, per_tile, 0)


def _dw_kernel(r0_ref, starts_ref, lidx_ref, x_any, gy_ref, o_ref,
               scratch, sems, *, T, WS, WU, G, n_pad):
    """dW[k] = sum_tiles select_k(window)^T @ gy_tile, accumulated in a
    VMEM-resident (26, cpad, cout) output across grid steps (same windowed
    selects as the forward; the center offset's dW is one big GEMM done in
    XLA by the caller)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def dma(slot, tt):
        r0 = pl.multiple_of(r0_ref[tt], 8)
        return pltpu.make_async_copy(
            x_any.at[pl.ds(r0, WU)], scratch.at[slot], sems.at[slot])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(t + 1 < n_steps)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()
    slot = t % 2
    iotas = [jax.lax.broadcasted_iota(jnp.int32, (T, w), 1) for w in WS]

    def per_tile(g, _):
        gT = pl.multiple_of(g * T, T)
        gy = gy_ref[pl.ds(gT, T), :]
        subs = []
        for r in range(3):
            u = pl.multiple_of(starts_ref[(t * G + g) * 3 + r], 8)
            subs.append(scratch.at[slot][pl.ds(u, WS[r]), :])
        for ki in range(26):
            k = ki if ki < 13 else ki + 1
            sub = subs[k // 9]
            li = lidx_ref[pl.ds(gT, T), ki:ki + 1].astype(jnp.int32)
            onehot = (li == iotas[k // 9]).astype(sub.dtype)
            sel = jnp.dot(onehot, sub, preferred_element_type=jnp.float32)
            dwk = jax.lax.dot_general(
                sel.astype(sub.dtype), gy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (cpad, cout)
            o_ref[ki] = o_ref[ki] + dwk
        return 0

    if G == 1:
        per_tile(0, 0)
    else:
        jax.lax.fori_loop(0, G, per_tile, 0)


def _bwd_fused_vmem_bytes(*, WU, WS, G, T, cpadg, cpad_in, cin, itemsize,
                          SQ, spill_rows) -> int:
    """Upper-bound estimate of the fused-backward kernel's VMEM footprint."""
    scratch = 2 * WU * cpadg * itemsize                   # gm union double-buf
    dw_acc = 27 * cpad_in * cpadg * 4                     # VMEM-resident dW
    blocked = 2 * (G * T) * (26 * 2 + 1)                  # lidx + valid
    blocked += 2 * (G * T) * cpad_in * itemsize           # x in window
    blocked += 2 * (G * T) * cin * itemsize               # dx out window
    resident = 27 * cpadg * cin * itemsize                # flipped weights
    if SQ:
        resident += spill_rows * (cin + 1) * 4            # dx spill table
        scratch += T * cin * 4                            # acc_sc
        resident += SQ * T * 12 + SQ * (cin + 1) * 4
    temp = (2 * T * max(WS) * 4 + 2 * T * cpadg * 4
            + 3 * T * max(cin, cpadg) * 4)
    return scratch + dw_acc + blocked + resident + temp


def _bwd_fused_kernel(*refs, T, WS, WU, G, SQ, cin, out_dtype):
    """Fused dx+dW backward: ONE gm union-window DMA and ONE one-hot select
    per offset feed BOTH gradients (the dx pass and the dW pass previously
    each paid their own window stream and 26 selects -- the dominant VPU
    cost, docs/DESIGN.md round-5 record).

    Identities (k3 stride-1 pair set is closed under the mirror
    (o, i, k) -> (i, o, 26-k)):
      dx[i]   = sum_k select_k(gm)[i] @ w[26-k]^T      (existing dx path)
      dW[26-k] = sum_tiles x_tile^T @ select_k(gm)_tile (NEW: the mirror of
                 a pair tabled at offset k is a forward pair at 26-k, so the
                 same select covers dW's mirror block; pairs whose MIRROR
                 spilled are added by the caller from the spill table with
                 flipped orientation)
    Center (k=13) is its own mirror: dW[13] += x_tile^T @ gm_center in-kernel
    (replaces the caller's XLA einsum over the full arrays)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q0_ref = qn_ref = tab_ref = None
    if SQ:
        r0_ref, starts_ref, q0_ref, qn_ref = refs[:4]
        rest = refs[4:]
    else:
        r0_ref, starts_ref = refs[:2]
        rest = refs[2:]
    lidx_ref, gm_any, w_ref, x_ref = rest[:4]
    i = 4
    if SQ:
        tab_ref = rest[i]
        i += 1
    valid_ref = rest[i]
    dx_ref, dw_ref = rest[i + 1], rest[i + 2]
    scratch, sems = rest[i + 3], rest[i + 4]
    acc_sc = rest[i + 5] if SQ else None

    t = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def dma(slot, tt):
        r0 = pl.multiple_of(r0_ref[tt], 8)
        return pltpu.make_async_copy(
            gm_any.at[pl.ds(r0, WU)], scratch.at[slot], sems.at[slot])

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(t + 1 < n_steps)
    def _():
        dma((t + 1) % 2, t + 1).start()

    dma(t % 2, t).wait()
    slot = t % 2
    iotas = [jax.lax.broadcasted_iota(jnp.int32, (T, w), 1) for w in WS]

    def per_tile(g, _):
        gT = pl.multiple_of(g * T, T)
        x_t = x_ref[pl.ds(gT, T), :]
        subs = []
        for r in range(3):
            u = pl.multiple_of(starts_ref[(t * G + g) * 3 + r], 8)
            subs.append(scratch.at[slot][pl.ds(u, WS[r]), :])

        def select(li, reg):
            sub = subs[reg]
            onehot = (li == iotas[reg]).astype(sub.dtype)
            sel = jnp.dot(onehot, sub, preferred_element_type=jnp.float32)
            return sel.astype(sub.dtype)

        c0 = pl.multiple_of(
            (t * G + g) * T - pl.multiple_of(r0_ref[t], 8), 8)
        xc = scratch.at[slot][pl.ds(c0, T), :]
        acc = jnp.dot(xc, w_ref[13], preferred_element_type=jnp.float32)
        dw_ref[13] = dw_ref[13] + jax.lax.dot_general(
            x_t, xc[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for ki in range(26):
            k = ki if ki < 13 else ki + 1
            li = lidx_ref[pl.ds(gT, T), ki:ki + 1].astype(jnp.int32)
            S = select(li, k // 9)
            acc = acc + jnp.dot(S, w_ref[k],
                                preferred_element_type=jnp.float32)
            dw_ref[26 - k] = dw_ref[26 - k] + jax.lax.dot_general(
                x_t, S, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if SQ:
            # dx spill inject, identical to the forward kernel's (per-pair
            # gm[in] @ flipW[k] values in a compact tile-sorted table)
            ti = t * G + g
            acc_sc[:] = acc

            @pl.when(qn_ref[2 * ti + 1] > 0)
            def _():
                q0 = pl.multiple_of(q0_ref[ti], 8)
                tab = tab_ref[pl.ds(q0, SQ), :]              # (SQ, cin+1)
                spv = tab[:, 0:cin]
                rows = tab[:, cin:cin + 1]
                iq = jax.lax.broadcasted_iota(jnp.int32, (SQ, T), 0)
                it = jax.lax.broadcasted_iota(jnp.int32, (SQ, T), 1)
                inseg = ((iq >= qn_ref[2 * ti]) &
                         (iq < qn_ref[2 * ti + 1]))
                ohT = jnp.where(inseg & (rows.astype(jnp.int32) == it),
                                1.0, 0.0)
                inj = jax.lax.dot_general(
                    ohT, spv, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # (T, cin)
                acc_sc[:] = acc_sc[:] + inj

            acc = acc_sc[:]
        y = acc * valid_ref[pl.ds(gT, T), 0][:, None].astype(jnp.float32)
        dx_ref[pl.ds(gT, T), :] = y.astype(out_dtype)
        return 0

    if G == 1:
        per_tile(0, 0)
    else:
        jax.lax.fori_loop(0, G, per_tile, 0)


def window_conv3_bwd_fused(x: jnp.ndarray, gm: jnp.ndarray, w: jnp.ndarray,
                           wg: WinGraph, valid: jnp.ndarray):
    """Fused backward: returns (dx (N_pad, Cin), dW (27, Cin, Cout) f32)
    INCLUDING all spill corrections, or None when the kernel is not
    applicable (CPU / fallback / VMEM overflow). gm must already be masked
    to valid rows."""
    n_pad, cin = x.shape
    cout = gm.shape[-1]
    from unscene3d_tpu.ops.csr_conv import fallback_active

    if ((jax.default_backend() == "cpu" and not interpret_active())
            or fallback_active()):
        return None

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WU, G, Tt = wg.w_union, wg.group, wg.tile
    WS = wg.w_subs or (wg.w_sub,) * 3
    SQ = int(wg.spill_q)
    wf = _flip_transpose(w).astype(x.dtype)                  # (27, cout, cin)
    cpadg = -(-cout // 128) * 128
    cpad_in = -(-cin // 128) * 128
    est = _bwd_fused_vmem_bytes(WU=WU, WS=WS, G=G, T=Tt, cpadg=cpadg,
                                cpad_in=cpad_in, cin=cin,
                                itemsize=x.dtype.itemsize, SQ=SQ,
                                spill_rows=int(wg.num_spill_padded))
    if est * 1.6 > _VMEM_CEILING:
        return None
    gmp = (gm if cpadg == cout
           else jnp.pad(gm, ((0, 0), (0, cpadg - cout)))).astype(x.dtype)
    wfp = wf if cpadg == cout else jnp.pad(
        wf, ((0, 0), (0, cpadg - cout), (0, 0)))
    xp = x if cpad_in == cin else jnp.pad(x, ((0, 0), (0, cpad_in - cin)))

    in_specs = [
        pl.BlockSpec((G * Tt, 26), lambda t, *_: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((G * Tt, cpad_in), lambda t, *_: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [wg.lidx, gmp, wfp, xp]
    if SQ:
        spv = _spill_values(gm, wf.astype(jnp.float32), wg, cin)
        rows_f = wg.spill_rows.astype(jnp.float32)[:, None]
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(jnp.concatenate([spv, rows_f], axis=1))
    in_specs.append(pl.BlockSpec((G * Tt, 1), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM))
    args.append(valid.astype(jnp.int8)[:, None])

    scratch_shapes = [
        pltpu.VMEM((2, WU, cpadg), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    prefetch = [wg.r0, wg.starts.reshape(-1)]
    if SQ:
        prefetch += [wg.sp_q0, wg.sp_qn.reshape(-1)]
        scratch_shapes.append(pltpu.VMEM((Tt, cin), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(n_pad // (G * Tt),),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((G * Tt, cin), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, cpad_in, cpadg), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch_shapes,
    )
    kernel = functools.partial(
        _bwd_fused_kernel, T=Tt, WS=WS, WU=WU, G=G, SQ=SQ, cin=cin,
        out_dtype=x.dtype)
    dx, dw = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, cin), x.dtype),
                   jax.ShapeDtypeStruct((27, cpad_in, cpadg), jnp.float32)],
        interpret=interpret_active(),
        compiler_params=_vmem_params(est),
    )(*prefetch, *args)
    dw = dw[:, :cin, :cout]
    # Pairs MISSED by the in-kernel dW: a forward pair (o, n, k) is covered
    # iff its mirror (n, o, 26-k) is tabled; missed iff the mirror spilled.
    # Spill entry e = (out, in, k_e) therefore stands for the missed pair
    # (out=e.in, in=e.out, 26-e.k), contributing x[e.out] (x) gm[e.in] to
    # dW[26-e.k] -- the ORIENTATION-FLIPPED version of the unfused path's
    # spill term. Sentinel entries read the zero padding row.
    if int(wg.num_spill_padded) > 0:
        xs = jnp.take(x, wg.spill_out, axis=0).astype(jnp.float32)
        gs = jnp.take(gm, wg.spill_in, axis=0).astype(jnp.float32)
        onek = jax.nn.one_hot(26 - wg.spill_k, 27, dtype=jnp.float32)
        dw = dw + jnp.einsum("pk,pc,pd->kcd", onek, xs, gs)
    return dx, dw


def _xla_dw(x, gy, wg: WinGraph, n_pad):
    tile_of = jnp.arange(n_pad) // wg.tile
    base = jnp.take(wg.r0, tile_of // wg.group)
    dws = []
    for ki in range(26):
        k = ki if ki < 13 else ki + 1
        li = wg.lidx[:, ki].astype(jnp.int32)
        rows = base + jnp.take(wg.starts[:, k // 9], tile_of) + li
        rows = jnp.where(li >= 0, rows, n_pad - 1)
        gk = jnp.take(x, rows, axis=0) * (li >= 0)[:, None].astype(x.dtype)
        dws.append(jnp.einsum("nc,nd->cd", gk.astype(jnp.float32),
                              gy.astype(jnp.float32)))
    return jnp.stack(dws)


def window_conv3_dw(x: jnp.ndarray, gy: jnp.ndarray, wg: WinGraph
                    ) -> jnp.ndarray:
    """Non-center dW blocks: (26, Cin, Cout) f32. gy must already be masked
    to valid rows. Spilled pairs are NOT included (caller adds them)."""
    n_pad, cin = x.shape
    cout = gy.shape[-1]
    from unscene3d_tpu.ops.csr_conv import fallback_active

    if ((jax.default_backend() == "cpu" and not interpret_active())
            or fallback_active()):
        return _xla_dw(x, gy, wg, n_pad)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WU, G, Tt = wg.w_union, wg.group, wg.tile
    WS = wg.w_subs or (wg.w_sub,) * 3
    cpad = -(-cin // 128) * 128
    est = _dw_vmem_bytes(WU=WU, WS=WS, G=G, T=Tt, cpad=cpad, cout=cout,
                         itemsize=x.dtype.itemsize)
    if est * 1.6 > _VMEM_CEILING:  # same liveness margin as _vmem_params
        return _xla_dw(x, gy, wg, n_pad)
    xp = x if cpad == cin else jnp.pad(x, ((0, 0), (0, cpad - cin)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // (G * Tt),),
        in_specs=[
            pl.BlockSpec((G * Tt, 26), lambda t, r, s: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((G * Tt, cout), lambda t, r, s: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((26, cpad, cout), lambda t, r, s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WU, cpad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_dw_kernel, T=Tt, WS=WS, WU=WU, G=G,
                               n_pad=n_pad)
    # starts must be FLAT 1-D for scalar prefetch (the kernel indexes
    # starts_ref[(t*G+g)*3+r]; a 2-D SMEM operand fails Mosaic lowering
    # with 'Can only load scalars from SMEM' -- ADVICE r3 high#1)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((26, cpad, cout), jnp.float32),
        interpret=interpret_active(),
        compiler_params=_vmem_params(est),
    )(wg.r0, wg.starts.reshape(-1), wg.lidx, xp, gy.astype(x.dtype))
    return out[:, :cin, :]


def _spill_values(x, w, wg: WinGraph, cout):
    """Per spilled pair p: x[in_p] @ w[k_p] -> (P_s, cout) f32. Sentinel
    pairs read the zero padding row and contribute zero."""
    xs = jnp.take(x, wg.spill_in, axis=0)                    # (P_s, Cin)
    acc = jnp.zeros((xs.shape[0], cout), jnp.float32)
    for k in range(27):
        m = (wg.spill_k == k)
        xk = xs * m[:, None].astype(xs.dtype)
        acc = acc + jnp.dot(xk, w[k], preferred_element_type=jnp.float32)
    return acc


def _spill_contrib(x, w, wg: WinGraph, n_pad, cout):
    """Spilled pairs as a dense (n_pad, cout) addend (XLA fallback path)."""
    return jax.ops.segment_sum(_spill_values(x, w, wg, cout), wg.spill_out,
                               num_segments=n_pad)


def _xla_reference(x, w, wg: WinGraph, valid, bias, scale, shift, residual,
                   relu):
    """Pure-XLA equivalent (CPU tests / interpret-free fallback): reconstruct
    absolute neighbor rows from the window tables and gather."""
    n_pad, cin = x.shape
    tile_of = jnp.arange(n_pad) // wg.tile
    base = jnp.take(wg.r0, tile_of // wg.group)  # (n_pad,)
    acc = jnp.dot(x, w[13], preferred_element_type=jnp.float32)
    for ki in range(26):
        k = ki if ki < 13 else ki + 1
        li = wg.lidx[:, ki].astype(jnp.int32)
        rows = base + jnp.take(wg.starts[:, k // 9], tile_of) + li
        rows = jnp.where(li >= 0, rows, n_pad - 1)
        g = jnp.take(x, rows, axis=0)
        g = g * (li >= 0)[:, None].astype(x.dtype)
        acc = acc + jnp.dot(g, w[k], preferred_element_type=jnp.float32)
    if wg.spill_q:
        acc = acc + _spill_contrib(x, w, wg, n_pad, w.shape[-1])
    return _epilogue(acc, valid, bias, scale, shift, residual, relu, x.dtype)


def _epilogue(acc, valid, bias, scale, shift, residual, relu, dtype):
    if bias is not None:
        acc = acc + bias
    if scale is not None:
        acc = acc * scale + shift
    if residual is not None:
        acc = acc + residual.astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    acc = acc * valid[:, None].astype(jnp.float32)
    return acc.astype(dtype)


def window_conv3_fwd(x: jnp.ndarray, w: jnp.ndarray, wg: WinGraph,
                     valid: jnp.ndarray,
                     bias: jnp.ndarray | None = None,
                     scale: jnp.ndarray | None = None,
                     shift: jnp.ndarray | None = None,
                     residual: jnp.ndarray | None = None,
                     relu: bool = False) -> jnp.ndarray:
    """x: (N_pad, Cin) with ZERO padding rows; w: (27, Cin, Cout).
    Optional fused epilogue: +bias, *scale+shift (folded BN), +residual,
    ReLU, validity mask. Returns (N_pad, Cout)."""
    n_pad, cin = x.shape
    cout = w.shape[-1]
    assert n_pad % wg.tile == 0
    from unscene3d_tpu.ops.csr_conv import fallback_active

    if ((jax.default_backend() == "cpu" and not interpret_active())
            or fallback_active()):
        b = None if bias is None else bias.astype(jnp.float32)
        sc = None if scale is None else scale.astype(jnp.float32)
        sh = None if shift is None else shift.astype(jnp.float32)
        return _xla_reference(x, w.astype(x.dtype), wg, valid, b, sc, sh,
                              residual, relu)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WU, G, Tt = wg.w_union, wg.group, wg.tile
    WS = wg.w_subs or (wg.w_sub,) * 3
    wk = w.astype(x.dtype)
    if bias is not None:
        # fold bias into shift (or create a unit scale-shift)
        if scale is not None:
            shift = shift + bias * scale
        else:
            scale = jnp.ones((cout,), jnp.float32)
            shift = bias.astype(jnp.float32)
    has_scale = scale is not None
    # spilled pairs fold in BEFORE the epilogue via tile-major per-pair
    # values injected in-kernel (one tiny (T, SQ) one-hot matmul per tile),
    # so the full epilogue always stays fused
    SQ = int(wg.spill_q)
    has_res = residual is not None

    # Mosaic requires DMA'd slices to be 128-lane aligned: pad channels for
    # the window source. Narrow convs (cin <= 32: the stem and the first
    # down stage) would waste 3/4+ of every select matmul's lanes, so they
    # PACK 4 rows into the 128 lanes instead: the one-hot picks the packed
    # super-row (4x narrower select), a lane-block mask isolates the
    # neighbor's channels, and weights tiled 4x along cin absorb the block
    # offset in the unchanged apply GEMM.
    PACK = 4 if (cin <= 32 and WU % 32 == 0
                 and all(w % 32 == 0 for w in WS)) else 1
    if PACK > 1:
        cp = 32
        xp = jnp.pad(x, ((0, 0), (0, cp - cin))) if cin < cp else x
        xp = xp.reshape(n_pad // PACK, PACK * cp)
        wp = jnp.pad(wk, ((0, 0), (0, cp - cin), (0, 0))) if cin < cp else wk
        wp = jnp.tile(wp, (1, PACK, 1))                  # (27, 128, cout)
        cpad = PACK * cp
    else:
        cpad = -(-cin // 128) * 128
        xp = x if cpad == cin else jnp.pad(x, ((0, 0), (0, cpad - cin)))
        wp = (wk if cpad == cin
              else jnp.pad(wk, ((0, 0), (0, cpad - cin), (0, 0))))

    est = _fwd_vmem_bytes(WU=WU, WS=WS, G=G, T=Tt, PACK=PACK, cpad=cpad,
                          cout=cout, itemsize=x.dtype.itemsize, SQ=SQ,
                          has_res=has_res,
                          spill_rows=int(wg.num_spill_padded))
    if est * 1.6 > _VMEM_CEILING:  # same liveness margin as _vmem_params
        # cannot fit even with the raised cap: take the XLA formulation
        # (bias already folded into scale/shift above)
        return _xla_reference(x, wk, wg, valid, None,
                              None if scale is None
                              else scale.astype(jnp.float32),
                              None if shift is None
                              else shift.astype(jnp.float32),
                              residual, relu)

    in_specs = [
        pl.BlockSpec((G * Tt, 26), lambda t, *_: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [wg.lidx, xp, wp]
    if SQ:
        # compact spill table: per-pair x[in]@w[k] values with the pair's
        # tile-local out row as a trailing f32 column
        spv = _spill_values(x, wk, wg, cout)
        rows_f = wg.spill_rows.astype(jnp.float32)[:, None]
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(jnp.concatenate([spv, rows_f], axis=1))
    if has_scale:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
        args += [scale.astype(jnp.float32).reshape(1, cout),
                 shift.astype(jnp.float32).reshape(1, cout)]
    if has_res:
        in_specs.append(pl.BlockSpec((G * Tt, cout), lambda t, *_: (t, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)
    in_specs.append(pl.BlockSpec((G * Tt, 1), lambda t, *_: (t, 0),
                                 memory_space=pltpu.VMEM))
    args.append(valid.astype(jnp.int8)[:, None])

    scratch_shapes = [
        pltpu.VMEM((2, WU // PACK, cpad), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    # scalar-prefetch arrays must be 1-D: Mosaic lays 2-D SMEM arrays out
    # with heavy minor-dim padding, which overflows the 1M SMEM budget
    prefetch = [wg.r0, wg.starts.reshape(-1)]
    if SQ:
        prefetch += [wg.sp_q0, wg.sp_qn.reshape(-1)]
        scratch_shapes.append(pltpu.VMEM((Tt, cout), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(n_pad // (G * Tt),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G * Tt, cout), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    kernel = functools.partial(
        _kernel, T=Tt, WS=WS, WU=WU, G=G, SQ=SQ, n_pad=n_pad, relu=relu,
        out_dtype=x.dtype, has_scale=has_scale, has_res=has_res, PACK=PACK)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, cout), x.dtype),
        interpret=interpret_active(),
        compiler_params=_vmem_params(est),
    )(*prefetch, *args)


@jax.custom_vjp
def window_conv3(x, w, wg, valid):
    return window_conv3_fwd(x, w, wg, valid)


def _win_fwd(x, w, wg, valid):
    return window_conv3(x, w, wg, valid), (x, w, wg, valid)


def _flip_transpose(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(w, axis=0).swapaxes(-1, -2)


import os as _os

_FUSED_BWD = _os.environ.get("UNSCENE3D_FUSED_BWD", "1") != "0"


def _win_bwd(res, g):
    x, w, wg, valid = res
    gm = (g * valid[:, None].astype(g.dtype)).astype(x.dtype)
    if _FUSED_BWD:
        fused = window_conv3_bwd_fused(x, gm, w, wg, valid)
        if fused is not None:
            dx, dw = fused
            return dx.astype(x.dtype), dw.astype(w.dtype), None, None
    # dx: same tables, flip-transposed weights (offset symmetry: the
    # transpose map of offset k is the map of offset 26-k)
    dx = window_conv3_fwd(gm, _flip_transpose(w).astype(w.dtype), wg, valid)
    # dW[k] = select_k(window)^T @ gm via the dW kernel (same windowed
    # selects as the forward; XLA reconstruction on CPU)
    n_pad, cin = x.shape
    dws = window_conv3_dw(x, gm, wg)
    dwc = jnp.einsum("nc,nd->cd", x.astype(jnp.float32),
                     gm.astype(jnp.float32))
    dw = jnp.concatenate([dws[:13], dwc[None], dws[13:]], axis=0)
    # spilled pairs' dW contributions (window_conv3_dw excludes spills).
    # dx needs NO explicit spill term: the flipped-weight forward above
    # already produces every pair's dx -- the k3 stride-1 pair set is closed
    # under the mirror (o,i,k)->(i,o,26-k), so forward pair p's dx term
    # arrives via its mirror entry in the SAME tables (lidx if tabled, the
    # in-kernel spill inject if spilled). The r3 explicit segment_sum here
    # double-counted spilled pairs' dx (~35% rel error on spill-heavy
    # graphs, VERDICT r3 weak#1).
    if int(wg.num_spill_padded) > 0:
        xs = jnp.take(x, wg.spill_in, axis=0).astype(jnp.float32)
        gs = jnp.take(gm, wg.spill_out, axis=0).astype(jnp.float32)
        onek = jax.nn.one_hot(wg.spill_k, 27, dtype=jnp.float32)
        dw = dw + jnp.einsum("pk,pc,pd->kcd", onek, xs, gs)
    return dx.astype(x.dtype), dw.astype(w.dtype), None, None


window_conv3.defvjp(_win_fwd, _win_bwd)
