"""CSR-compacted k3 sparse convolution with a Pallas segment-combine kernel.

Why: on this TPU, row gathers are the sparse conv's bottleneck and ~72% of
the 27-way neighbor-map rows are padding (invalid neighbors gathering the
zero row). Measured on the bench scene's L0 (204800 pad rows, 96ch bf16):
full masked gather 17.9ms vs valid-pairs-only gather 7.7ms.

Formulation (one conv):
  host   : valid (out,in) pairs per non-center offset, one uniform-stride
           block per offset (stride PB, bucketed so shapes are stable across
           batches), sorted by out row within each block; plus per-out-tile
           chunk starts.
  XLA    : xg = take(x, in_rows)              -- the ONLY gather, valid pairs
  Pallas : grid over out tiles; per offset k the tile's pairs are a
           CONTIGUOUS chunk of xg (<= TILE pairs, since each out row has at
           most one neighbor per offset). The kernel streams each chunk,
           builds a one-hot match matrix M[r, p] = (pair p's out == tile row
           r) and accumulates (M @ chunk) @ W[k] on the MXU -- an exact,
           deterministic, gather-free segment combine. The center offset is
           a streamed x-tile GEMM; bias / residual / ReLU / output-validity
           masking are fused in the epilogue.

Precision matches the gather path: M @ chunk is exact (0/1 times bf16 input
rows), and all W GEMMs accumulate in f32.

Backward: k3 offsets are symmetric, so dx = csr_conv3(dy, flipT(W)) with the
SAME tables (the identity ops/conv_ops.py already uses), and
dW[k] = xg_k^T @ dy[out_rows_k] -- two compacted gathers + block GEMMs, all
scatter-free.

Reference being replaced: MinkowskiEngine's gather-GEMM-scatter CUDA conv
(models/modules/common.py:125-158).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256          # out rows per grid step (levels using CSR pad N to this)

# While a flax init (or any one-shot shape-only evaluation) runs on the host
# CPU, the conv router falls back to the gather formulation: Pallas interpret
# mode emulates every grid step in Python and would take minutes per conv.
_FALLBACK = [False]


@contextlib.contextmanager
def gather_fallback():
    _FALLBACK.append(True)
    try:
        yield
    finally:
        _FALLBACK.pop()


def fallback_active() -> bool:
    return _FALLBACK[-1]

FAR = np.int32(2**31 - 2**8)  # dummy-pair out row: never matches any tile


@struct.dataclass
class CsrGraph:
    """Pair tables of one level's k3 topology (non-center offsets).

    Pair axis layout: 26 back-to-back RAGGED blocks — offset ki's pairs live
    at [base_ki, base_ki + count_ki) inside a bucket of pb[ki] rows whose
    tail is >= 2*TILE dummies, so every chunk start has a full 2-block read
    window that cannot bleed real out-rows from the next offset. (Uniform
    blocks wasted ~30% of the gather rows at dense levels, where per-offset
    valid counts are skewed.)
    """

    in_rows: jnp.ndarray    # (P_pad,) int32 into the level's flat rows
    out_rows: jnp.ndarray   # (P_pad, 1) int32; dummy pairs -> FAR
    starts: jnp.ndarray     # (O, 26) int32 chunk start per (out tile, offset)
    pb: tuple = struct.field(pytree_node=False, default=())  # 26 bucket sizes

    @property
    def bases(self) -> tuple:
        out, acc = [], 0
        for b in self.pb:
            out.append(acc)
            acc += b
        return tuple(out)

    @property
    def num_pairs_padded(self) -> int:
        return self.in_rows.shape[0]


def build_csr_graph(nbr_idx: np.ndarray, n_pad: int,
                    pb=None) -> CsrGraph:
    """Build pair tables from a (27, N_pad) k3 neighbor map (missing ->
    n_pad-1). Excludes the center offset (13). `pb`: per-offset bucket sizes
    from a pad plan (26 ints; a single int means uniform buckets; None
    buckets each offset's own valid count)."""
    from unscene3d_tpu.ops.sparse_graph import bucket_size

    nbr_idx = np.asarray(nbr_idx)
    assert nbr_idx.shape[1] == n_pad
    assert n_pad % TILE == 0, f"n_pad {n_pad} must be a multiple of {TILE}"
    o_tiles = n_pad // TILE

    ks = [k for k in range(27) if k != 13]
    valids = [nbr_idx[k] != (n_pad - 1) for k in ks]
    counts = [int(v.sum()) for v in valids]
    # >= 2*TILE dummy gap at each bucket end so a chunk's 2-block read
    # window can never reach the next offset's bucket (whose out rows would
    # falsely match the one-hot filter)
    if pb is None:
        pbs = tuple(bucket_size(c + 2 * TILE + 1, align=TILE,
                                min_size=4 * TILE) for c in counts)
    elif isinstance(pb, (int, np.integer)):
        pbs = (int(pb),) * 26
    else:
        pbs = tuple(int(b) for b in pb)
    for c, b in zip(counts, pbs):
        assert b >= c + 2 * TILE, f"csr bucket {b} too small for {c} pairs"
    bases = np.concatenate([[0], np.cumsum(pbs)])[:26].astype(np.int64)
    p_pad = int(sum(pbs)) + 2 * TILE

    in_rows = np.full(p_pad, n_pad - 1, np.int32)   # dummies gather zero row
    out_rows = np.full(p_pad, FAR, np.int32)
    starts = np.zeros((o_tiles, 26), np.int32)
    for ki, k in enumerate(ks):
        outs = np.nonzero(valids[ki])[0].astype(np.int32)
        lo = int(bases[ki])
        in_rows[lo:lo + counts[ki]] = nbr_idx[k][valids[ki]].astype(np.int32)
        out_rows[lo:lo + counts[ki]] = outs
        s = lo + np.searchsorted(outs, np.arange(o_tiles) * TILE)
        starts[:, ki] = np.minimum(s, p_pad - 2 * TILE).astype(np.int32)

    return CsrGraph(
        in_rows=jnp.asarray(in_rows),
        out_rows=jnp.asarray(out_rows[:, None]),
        starts=jnp.asarray(starts),
        pb=pbs,
    )


def _kernel(starts_ref, *refs, relu: bool, out_dtype, has_res: bool,
            r_per_step: int, n_steps: int):
    # grid = (O, n_steps): r_per_step offsets per step (13 default). One step
    # per offset (grid (O, 26)) is step-overhead-bound (~0.8us x 20.8k
    # steps); all 26 in one step overflows Mosaic's scoped VMEM -- as do 13
    # at training widths (f32, 192ch concat inputs), where the caller lowers
    # r_per_step from a scoped-VMEM estimate. The out block and f32 scratch
    # accumulator stay resident across a tile's steps. Steps beyond offset
    # 25 read the dummy tail (FAR out rows + zero input rows), contributing
    # exactly zero through the one-hot filter.
    R = r_per_step
    xga = refs[0:R]
    xgb = refs[R:2 * R]
    ora = refs[2 * R:3 * R]
    orb = refs[3 * R:4 * R]
    x_ref, valid_ref, w_ref, bias_ref = refs[4 * R:4 * R + 4]
    res_ref = refs[4 * R + 4] if has_res else None
    o_ref = refs[4 * R + 5] if has_res else refs[4 * R + 4]
    acc_ref = refs[-1]

    o = pl.program_id(0)
    gi = pl.program_id(1)

    @pl.when(gi == 0)
    def _():
        # center offset: streamed x tile
        acc_ref[:] = jnp.dot(x_ref[:], w_ref[13],
                             preferred_element_type=jnp.float32)

    # the one-hot match matrix filters over the full 2-block read window, so
    # no dynamic slicing is needed in-kernel (Mosaic has no value
    # dynamic_slice); rows outside [start, start+TILE) simply never match.
    # Built transposed -- (window, tile) with a 2D compare, contracted over
    # the window dim -- because the (1, window) broadcast layout of the
    # direct form overflows Mosaic's scoped VMEM.
    row_ids = (o * TILE
               + jax.lax.broadcasted_iota(jnp.int32, (2 * TILE, TILE), 1))
    acc = acc_ref[:]
    for r in range(R):
        ki = gi * R + r
        k = jnp.minimum(ki + (ki >= 13).astype(jnp.int32), 26)
        chunk = jnp.concatenate([xga[r][:], xgb[r][:]], axis=0)   # (2T, Cin)
        orow2 = jnp.concatenate([ora[r][:], orb[r][:]], axis=0)   # (2T, 1)
        mt = (orow2 == row_ids).astype(chunk.dtype)               # (2T, T)
        # f32 accumulate (MXU requirement); the result is an exact row
        # selection, so the cast back to the input dtype is lossless
        gathered = jax.lax.dot_general(mt, chunk, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        acc += jnp.dot(gathered.astype(chunk.dtype), w_ref[k],
                       preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(gi == n_steps - 1)
    def _():
        y = acc_ref[:] + bias_ref[0, :]
        if has_res:
            y = y + res_ref[:].astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        y = y * valid_ref[:, 0][:, None].astype(jnp.float32)
        o_ref[:] = y.astype(out_dtype)


def csr_conv3_fwd(x: jnp.ndarray, w: jnp.ndarray, csr: CsrGraph,
                  valid: jnp.ndarray,
                  bias: jnp.ndarray | None = None,
                  residual: jnp.ndarray | None = None,
                  relu: bool = False,
                  interpret: bool | None = None) -> jnp.ndarray:
    """x: (N_pad, Cin), w: (27, Cin, Cout), valid: (N_pad,) bool.
    Returns (N_pad, Cout). Requires x's padding rows to be zero."""
    n_pad, cin = x.shape
    cout = w.shape[-1]
    assert n_pad % TILE == 0, f"n_pad {n_pad} must be a multiple of {TILE}"
    o_tiles = n_pad // TILE
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)

    xg = jnp.take(x, csr.in_rows, axis=0)            # the only gather
    valid_i8 = valid.astype(jnp.int8)[:, None]

    # offsets per grid step: 13 when the chunk windows fit Mosaic's ~16MB
    # scoped VMEM, fewer at wide-channel / f32 configurations (training's
    # 192ch concat levels overflowed at R=13). Estimate the resident set:
    # R chunk-pairs (2*TILE x cin) double-buffered + weights + x/out tiles.
    itemsize = jnp.dtype(x.dtype).itemsize
    # conservative: Mosaic's scoped accounting exceeded this estimate by
    # ~45% at the training widths that overflowed (19.6M actual vs 13.5M
    # estimated), so budget well under the 16M limit
    budget = 9 * 1024 * 1024
    fixed = (27 * cin * cout + TILE * (cin + 2 * cout)) * itemsize \
        + TILE * cout * 4
    per_r = 2 * (2 * TILE * (cin * itemsize + 4))      # double-buffered
    r_per_step = max(1, min(13, (budget - fixed) // max(per_r, 1)))
    n_steps = -(-26 // r_per_step)                      # ceil
    R = int(r_per_step)

    # starts padded so steps beyond offset 25 read the all-dummy tail
    starts = csr.starts
    p_pad_rows = xg.shape[0]
    extra = n_steps * R - 26
    if extra > 0:
        tail = jnp.full((starts.shape[0], extra), p_pad_rows - 2 * TILE,
                        starts.dtype)
        starts = jnp.concatenate([starts, tail], axis=1)

    def chunk_spec(r, width, plus_one):
        def imap(o, gi, s, r=r, plus_one=plus_one):
            return (s[o, gi * R + r] // TILE + plus_one, 0)
        return pl.BlockSpec((TILE, width), imap, memory_space=pltpu.VMEM)

    in_specs = (
        [chunk_spec(r, cin, 0) for r in range(R)]
        + [chunk_spec(r, cin, 1) for r in range(R)]
        + [chunk_spec(r, 1, 0) for r in range(R)]
        + [chunk_spec(r, 1, 1) for r in range(R)]
        + [pl.BlockSpec((TILE, cin), lambda o, gi, s: (o, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((TILE, 1), lambda o, gi, s: (o, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM)]
    )
    args = ([xg] * (2 * R) + [csr.out_rows] * (2 * R)
            + [x, valid_i8, w.astype(x.dtype),
               bias.astype(jnp.float32).reshape(1, cout)])
    has_res = residual is not None
    if has_res:
        in_specs.append(pl.BlockSpec((TILE, cout), lambda o, gi, s: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(o_tiles, n_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, cout), lambda o, gi, s: (o, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE, cout), jnp.float32)],
    )
    kernel = functools.partial(_kernel, relu=relu, out_dtype=x.dtype,
                               has_res=has_res, r_per_step=R,
                               n_steps=n_steps)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, cout), x.dtype),
        interpret=interpret,
    )(starts, *args)


def _flip_transpose(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(w, axis=0).swapaxes(-1, -2)


@jax.custom_vjp
def csr_conv3(x, w, csr, valid):
    return csr_conv3_fwd(x, w, csr, valid)


def _csr_fwd(x, w, csr, valid):
    return csr_conv3(x, w, csr, valid), (x, w, csr, valid)


def _csr_bwd(res, g):
    x, w, csr, valid = res
    gm = (g * valid[:, None].astype(g.dtype)).astype(x.dtype)
    # dx: same tables, flip-transposed weights (offset symmetry)
    dx = csr_conv3_fwd(gm, _flip_transpose(w).astype(w.dtype), csr, valid)
    # dW: per-offset block GEMMs over compacted pairs (static stride pb)
    xg = jnp.take(x, csr.in_rows, axis=0).astype(jnp.float32)
    outs = jnp.where(csr.out_rows[:, 0] == FAR, x.shape[0] - 1,
                     csr.out_rows[:, 0])
    gg = jnp.take(gm, outs, axis=0).astype(jnp.float32)
    bases = csr.bases
    dws = []
    for ki in range(26):
        lo, b = bases[ki], csr.pb[ki]
        # dummies contribute zero (xg dummy rows are the zero padding row;
        # gg dummy rows are the masked zero padding row)
        dws.append(jnp.einsum("pc,pd->cd", xg[lo:lo + b], gg[lo:lo + b]))
    dw_center = jnp.einsum("nc,nd->cd", x.astype(jnp.float32),
                           gm.astype(jnp.float32))
    dw = jnp.stack(dws[:13] + [dw_center] + dws[13:], axis=0)
    return dx.astype(x.dtype), dw.astype(w.dtype), None, None


csr_conv3.defvjp(_csr_fwd, _csr_bwd)
