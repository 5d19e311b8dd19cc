"""Decompose the windowed-select conv kernel's time: DMA vs one-hot build
vs select matmuls vs offset GEMMs (timing-only variants, results wrong by
construction except 'full').

  VARIANTS="full no_onehot no_select no_gemm dma_only" CIN=128 \
      python benchmarks/proto_win_decompose.py
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

T = 256


def make_kernel(variant, W, WU, G, out_dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(r0_ref, starts_ref, lidx_ref, x_any, w_ref, o_ref,
                scratch, sems):
        t = pl.program_id(0)
        n_steps = pl.num_programs(0)

        def dma(slot, tt):
            r0 = pl.multiple_of(r0_ref[tt], 8)
            return pltpu.make_async_copy(
                x_any.at[pl.ds(r0, WU)], scratch.at[slot], sems.at[slot])

        @pl.when(t == 0)
        def _():
            dma(0, 0).start()

        @pl.when(t + 1 < n_steps)
        def _():
            dma((t + 1) % 2, t + 1).start()

        dma(t % 2, t).wait()
        slot = t % 2
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)

        def per_tile(g, _):
            gT = pl.multiple_of(g * T, T)
            c0 = pl.multiple_of(
                (t * G + g) * T - pl.multiple_of(r0_ref[t], 8), 8)
            xc = scratch.at[slot][pl.ds(c0, T), :]
            acc = jnp.dot(xc, w_ref[13], preferred_element_type=jnp.float32)
            if variant != "dma_only":
                fixed = (lidx_ref[pl.ds(gT, T), 0:1].astype(jnp.int32)
                         == iota).astype(x_any.dtype)
                for ki in range(26):
                    k = ki if ki < 13 else ki + 1
                    u = pl.multiple_of(
                        starts_ref[(t * G + g) * 3 + k // 9], 8)
                    sub = scratch.at[slot][pl.ds(u, W), :]
                    if variant == "no_select":
                        sel = sub[0:T, :].astype(jnp.float32)
                    else:
                        if variant == "no_onehot":
                            onehot = fixed
                        else:
                            li = lidx_ref[pl.ds(gT, T), ki:ki + 1].astype(jnp.int32)
                            onehot = (li == iota).astype(sub.dtype)
                        sel = jnp.dot(onehot, sub,
                                      preferred_element_type=jnp.float32)
                    if variant == "no_gemm":
                        acc = acc + sel[:, :acc.shape[-1]]
                    else:
                        acc = acc + jnp.dot(sel.astype(x_any.dtype), w_ref[k],
                                            preferred_element_type=jnp.float32)
            o_ref[pl.ds(gT, T), :] = acc.astype(out_dtype)
            return 0

        jax.lax.fori_loop(0, G, per_tile, 0)

    return _kernel


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops.window_conv import build_win_graph
    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    variants = os.environ.get(
        "VARIANTS", "full no_onehot no_select no_gemm dma_only").split()
    cin = cout = int(os.environ.get("CIN", 128))
    g = int(os.environ.get("GROUP", 8))
    w_sub = int(os.environ.get("W_SUB", 384))

    scene = make_scene(num_points=250_000, num_objects=12, extent=8.0, seed=0)
    batch, _ = FreeMaskCollator(voxel_size=0.02, fine_buckets=True,
                                win_levels=(0,), win_group=g)([scene])
    level = batch.graph.levels[0]
    n_pad = level.num_padded
    wg = build_win_graph(np.asarray(level.nbr_idx), n_pad, w_sub=w_sub,
                         w_union=4096 + (g - 1) * 256, group=g)
    WU = wg.w_union

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n_pad, cin), jnp.bfloat16)
    w = jnp.asarray(rng.randn(27, cin, cout) * 0.05, jnp.bfloat16)
    r0 = jnp.asarray(wg.r0)
    starts = jnp.asarray(wg.starts).reshape(-1)
    lidx = jnp.asarray(wg.lidx)

    K = 8
    if "harness" in variants:
        variants.remove("harness")

        def hbody(x, w):
            s = jnp.zeros((), jnp.float32)
            xx = x
            for _ in range(K):
                s = s + xx.astype(jnp.float32).sum() * 1e-6
                xx = x + (s * 1e-12).astype(x.dtype)
            return s

        jh = jax.jit(hbody)
        float(jh(x, w))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jh(x, w))
            ts.append(time.perf_counter() - t0)
        print(f"{'harness':>10}: {float(np.median(ts))/K*1e3:.2f}ms",
              flush=True)

    for variant in variants:
        kernel = make_kernel(variant, w_sub, WU, g, jnp.bfloat16)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_pad // (g * T),),
            in_specs=[
                pl.BlockSpec((g * T, 26), lambda t, r, s: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g * T, cout), lambda t, r, s: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, WU, cin), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        conv = lambda x, w: pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, cout), jnp.bfloat16),
        )(r0, starts, lidx, x, w)

        def body(x, w):
            s = jnp.zeros((), jnp.float32)
            xx = x
            for _ in range(K):
                y = conv(xx, w)
                s = s + y.astype(jnp.float32).sum()
                xx = x + (s * 1e-12).astype(x.dtype)
            return s

        jbody = jax.jit(body)
        float(jbody(x, w))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jbody(x, w))
            ts.append(time.perf_counter() - t0)
        print(f"{variant:>10}: {float(np.median(ts))/K*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
