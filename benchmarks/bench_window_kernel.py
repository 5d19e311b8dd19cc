"""Isolated window-conv kernel A/Bs on the real chip.

The r5 b8 traces showed the window kernels at ~29ms/conv at the flagship
level-0 width REGARDLESS of dtype (f32 vs bf16 identical), i.e. the kernel
is NOT MXU-rate-bound: suspects are the in-kernel one-hot construction
(VPU compares), per-tile loop overheads, and DMA. This stands one L0-shaped
conv alone and times fwd / dx / dW per dtype so kernel changes can be
A/B'd in ~2min instead of a 25min full-step compile.

Usage: python benchmarks/bench_window_kernel.py [--cin 96] [--cout 96]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cin", type=int, default=96)
    ap.add_argument("--cout", type=int, default=96)
    ap.add_argument("--points", type=int, default=250_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops.window_conv import window_conv3, window_conv3_dw

    scene = make_scene(num_points=args.points, num_objects=12, extent=8.0,
                       seed=0)
    batch, _ = FreeMaskCollator(voxel_size=0.02,
                                win_levels=(0, 1, 2, 3, 4))([scene])
    L0 = batch.graph.levels[0]
    wg, valid = L0.win, L0.valid
    n_pad = L0.num_padded
    print(f"n_pad={n_pad} tile={wg.tile} group={wg.group} "
          f"w_subs={wg.w_subs} w_union={wg.w_union} spill_q={wg.spill_q}",
          file=sys.stderr)
    r = np.random.RandomState(0)

    def timeit(f, *a, n=8):
        g = jax.jit(f)
        float(jnp.sum(g(*a).astype(jnp.float32)))  # compile+warm
        t0 = time.perf_counter()
        outs = [g(*a) for _ in range(n)]
        float(jnp.sum(outs[-1].astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(r.randn(n_pad, args.cin), dt)
        w = jnp.asarray(0.1 * r.randn(27, args.cin, args.cout), dt)
        gy = jnp.asarray(r.randn(n_pad, args.cout), dt)
        t_fwd = timeit(lambda x, w: window_conv3(x, w, wg, valid), x, w)
        t_dw = timeit(lambda x, gy: window_conv3_dw(x, gy, wg), x, gy)

        def full_bwd(x, w, gy):
            _, vjp = jax.vjp(lambda x, w: window_conv3(x, w, wg, valid), x, w)
            return vjp(gy)[0]

        t_bwd = timeit(full_bwd, x, w, gy)
        name = np.dtype(dt).name
        print(f"[{name}] fwd {t_fwd:.2f}ms  dw {t_dw:.2f}ms  "
              f"fullbwd(dx+dw) {t_bwd:.2f}ms")


if __name__ == "__main__":
    main()
