"""Prototype + microbench: Pallas brick shift-GEMM conv and windowed one-hot
assembly, vs the XLA gather path, on the bench scene's true L0 topology.

Decides the round-2 sparse-conv engine design. Run on the real chip:
    python benchmarks/proto_brick_pallas.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch_time(f, *args, n=6):
    import jax
    import jax.numpy as jnp

    s = jax.jit(lambda *a: f(*a).astype(jnp.float32).sum())
    float(s(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(s(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene

    scene = make_scene(num_points=250_000, num_objects=12, extent=8.0, seed=0)
    batch, meta = FreeMaskCollator(voxel_size=0.02)([scene])
    L0 = batch.graph.levels[0]
    coords = np.asarray(L0.coords)
    valid = np.asarray(L0.valid)
    n_pad = L0.num_padded
    real = coords[valid][:, 1:]  # single scene -> drop batch col
    N = len(real)
    print(f"N={N} n_pad={n_pad}")

    # ---- host: brick decomposition in Morton order --------------------------
    t0 = time.perf_counter()
    brick_coord = real >> 3

    def morton3(c):
        c = c.astype(np.uint64)
        out = np.zeros(len(c), np.uint64)
        for b in range(16):
            for d in range(3):
                out |= ((c[:, d] >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + (2 - d))
        return out

    bkey = morton3(brick_coord)
    uniq, inv = np.unique(bkey, return_inverse=True)
    nb = len(uniq)
    # sort voxels by (brick morton, cell id)
    local = real - (brick_coord << 3)
    cell = local[:, 0] * 100 + local[:, 1] * 10 + local[:, 2]  # placeholder (8^3 -> use 64-stride later)
    cell = local[:, 0] * 64 + local[:, 1] * 8 + local[:, 2]
    order = np.lexsort((cell, inv))
    inv_sorted = inv[order]
    print(f"bricks={nb} avg voxels/brick={N/nb:.1f} occupancy={N/(nb*512):.2f}")

    # brick coords of the unique bricks, in morton order
    ubrick = np.zeros((nb, 3), np.int64)
    ubrick[inv_sorted] = brick_coord[order]
    # run start of each brick in the sorted voxel array
    starts = np.searchsorted(inv_sorted, np.arange(nb))
    ends = np.searchsorted(inv_sorted, np.arange(nb), side="right")

    # neighbor brick ids via hash
    key2id = {int(k): i for i, k in enumerate(uniq)}
    nbr_ids = np.full((nb, 27), -1, np.int64)
    for k, (dx, dy, dz) in enumerate([(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1)]):
        nc = ubrick + np.array([dx, dy, dz])
        nk = morton3(np.maximum(nc, 0))
        ok = (nc >= 0).all(1)
        for i in np.nonzero(ok)[0]:
            nbr_ids[i, k] = key2id.get(int(nk[i]), -1)

    # window stats: rows of sorted voxels covering brick + neighbors
    wlo = np.full(nb, 2**31, np.int64)
    whi = np.zeros(nb, np.int64)
    for i in range(nb):
        ids = nbr_ids[i][nbr_ids[i] >= 0]
        wlo[i] = starts[ids].min()
        whi[i] = ends[ids].max()
    wsize = whi - wlo
    print(f"window rows: mean={wsize.mean():.0f} p95={np.percentile(wsize,95):.0f} "
          f"max={wsize.max()}  (host prep {time.perf_counter()-t0:.2f}s)")

    C = 96
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(N, C)), jnp.bfloat16)  # sorted voxel features
    w = jnp.asarray(rng.normal(size=(27, C, C)) * 0.1, jnp.bfloat16)

    # ---- assembled brick tensor (NB, 1000, C) via XLA gather ---------------
    CELLS = 1008  # 1000 halo cells + pad so slice 111+111+784 stays in bounds
    # per-cell source row in sorted array (or N -> zero row)
    xpad = jnp.concatenate([xs, jnp.zeros((1, C), jnp.bfloat16)], 0)
    # host: build assemble idx
    t0 = time.perf_counter()
    cell_coords = np.stack(np.meshgrid(np.arange(-1, 9), np.arange(-1, 9), np.arange(-1, 9), indexing="ij"), -1).reshape(-1, 3)
    # hash real voxel coords -> sorted row
    from unscene3d_tpu.ops.hashing import CoordHashTable
    sorted_coords = real[order]
    tbl = CoordHashTable(np.column_stack([np.zeros(N, np.int64), sorted_coords]))
    asm = np.full((nb, CELLS), N, np.int64)
    base = (ubrick << 3)
    for ci in range(0, 1000, 250):
        cc = cell_coords[ci:ci + 250]
        q = base[:, None, :] + cc[None, :, :]
        keys = np.column_stack([np.zeros(q.reshape(-1, 3).shape[0], np.int64), q.reshape(-1, 3)])
        idx, found = tbl.lookup(keys)
        asm[:, ci:ci + 250] = np.where(found, idx, N).reshape(nb, -1)
    print(f"assemble-map host build {time.perf_counter()-t0:.2f}s")
    asm_j = jnp.asarray(asm, jnp.int32)

    t_asm_xla = fetch_time(lambda x: jnp.take(x, asm_j.reshape(-1), axis=0).reshape(nb, CELLS, C), xpad)
    print(f"XLA assembly gather (nb*1000 rows): {t_asm_xla*1e3:.1f}ms")

    G = jnp.take(xpad, asm_j.reshape(-1), axis=0).reshape(nb, CELLS, C)

    # ---- XLA gather conv reference time (from bench_convs: ~20ms) ----------
    from unscene3d_tpu.ops import conv_ops
    xfull = jnp.zeros((n_pad, C), jnp.bfloat16).at[:N].set(xs)
    t_gather = fetch_time(lambda x, w: conv_ops.sparse_conv3(x, w, L0), xfull, w)
    print(f"XLA gather conv 96->96: {t_gather*1e3:.1f}ms")

    # ---- Pallas brick shift-GEMM conv ---------------------------------------
    # G: (NB, 1000, C) where cell = x*100+y*10+z over 10^3 halo'd brick.
    # out rows [111, 889) = window covering interior cells; per offset k:
    # acc += G[i, 111+d_k : 889+d_k, :] @ w[k]
    deltas = [dx * 100 + dy * 10 + dz for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]

    def conv_kernel(g_ref, w_ref, o_ref):
        acc = jnp.zeros((784, C), jnp.float32)
        for k, d in enumerate(deltas):
            a = g_ref[0, pl.ds(111 + d, 784), :]
            acc += jnp.dot(a, w_ref[k], preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(111, 784), :] = acc.astype(jnp.bfloat16)
        o_ref[0, pl.ds(0, 111), :] = jnp.zeros((111, C), jnp.bfloat16)
        o_ref[0, pl.ds(895, 113), :] = jnp.zeros((113, C), jnp.bfloat16)

    nb_pad = ((nb + 7) // 8) * 8
    Gp = jnp.zeros((nb_pad, CELLS, C), jnp.bfloat16).at[:nb].set(G)

    def brick_conv(Gp, w):
        return pl.pallas_call(
            conv_kernel,
            grid=(nb_pad,),
            in_specs=[
                pl.BlockSpec((1, CELLS, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CELLS, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb_pad, CELLS, C), jnp.bfloat16),
        )(Gp, w)

    try:
        t_pallas = fetch_time(brick_conv, Gp, w)
        print(f"Pallas brick conv 96->96 (nb={nb_pad}): {t_pallas*1e3:.1f}ms")
    except Exception as e:
        print("Pallas brick conv FAILED:", type(e).__name__, str(e)[:400])
        return

    # correctness vs gather conv on the real voxel set
    out_pallas = brick_conv(Gp, w)
    # map back: voxel sorted row -> (brick, cell interior)
    cell_sorted = cell[order]
    own_brick = inv_sorted
    interior_cell = ((cell_sorted // 64) + 1) * 100 + (((cell_sorted // 8) % 8) + 1) * 10 + (cell_sorted % 8 + 1)
    got = np.asarray(out_pallas)[own_brick, interior_cell]  # (N, C)

    ref_full = conv_ops.sparse_conv3(xfull, w, L0)
    # xfull rows 0..N-1 are xs (sorted); L0 rows: valid rows are the first N? no --
    # build mapping: L0 valid rows hold coords[valid]; our sorted order is a permutation
    ref = np.asarray(ref_full)[:N]
    # ref rows follow 'real' (unsorted); got rows follow sorted order
    ref_sorted = ref[order]
    err = np.abs(got.astype(np.float32) - ref_sorted.astype(np.float32)).max()
    rel = err / (np.abs(ref_sorted.astype(np.float32)).max() + 1e-6)
    print(f"brick-vs-gather max abs err {err:.4f} rel {rel:.5f}")


if __name__ == "__main__":
    main()
