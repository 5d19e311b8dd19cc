"""Per-conv micro-benchmarks on the real chip: where do the backbone's ms go?

Times representative conv shapes from Res16UNet34C on the bench scene's true
topology, for each implementation (gather scan/unroll, dense-brick XLA).

Usage: python benchmarks/bench_convs.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np


def timeit(f, *args, n=6):
    import jax
    import jax.numpy as jnp

    out = f(*args)
    s = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
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

    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops import conv_ops

    dtype = jnp.bfloat16
    scene = make_scene(num_points=250_000, num_objects=12, extent=8.0, seed=0)
    batch, meta = FreeMaskCollator(voxel_size=0.02)([scene])
    g = batch.graph
    for lvl, L in enumerate(g.levels):
        print(f"L{lvl}: N_pad={L.num_padded} valid={int(np.asarray(L.valid).sum())}")

    key = jax.random.PRNGKey(0)

    def rnd(*shape):
        return jax.random.normal(key, shape, dtype) * 0.1

    noop = jax.jit(lambda x: x.astype(jnp.float32).sum())
    x0 = rnd(g.levels[0].num_padded, 96)
    float(noop(x0))
    t0s = []
    for _ in range(6):
        t = time.perf_counter()
        float(noop(x0))
        t0s.append(time.perf_counter() - t)
    print(f"relay noop: {np.median(t0s)*1e3:.1f}ms")

    cases = [
        ("L0 k3 3->32 (stem)", 0, 3, 32, "k3"),
        ("L0 k3 96->96", 0, 96, 96, "k3"),
        ("L0 k3 128->96", 0, 128, 96, "k3"),
        ("L1 k3 64->64", 1, 64, 64, "k3"),
        ("L1 k3 160->96", 1, 160, 96, "k3"),
        ("L2 k3 128->128", 2, 128, 128, "k3"),
        ("L3 k3 256->256", 3, 256, 256, "k3"),
        ("L1 down2 32->32", 1, 32, 32, "down2"),
        ("L0 up2 96->96", 0, 96, 96, "up2"),
    ]
    for name, lvl, cin, cout, kind in cases:
        L = g.levels[lvl]
        if kind == "k3":
            x = rnd(L.num_padded, cin)
            w = rnd(27, cin, cout)
            f = lambda x, w: conv_ops.sparse_conv3(x, w, L)
            t = timeit(f, x, w)
        elif kind == "down2":
            fine = g.levels[lvl - 1]
            x = rnd(fine.num_padded, cin)
            w = rnd(8, cin, cout)
            f = lambda x, w: conv_ops.sparse_conv_down2(x, w, L, fine=fine)
            t = timeit(f, x, w)
        else:  # up2
            coarse = g.levels[lvl + 1]
            x = rnd(coarse.num_padded, cin)
            w = rnd(8, cin, cout)
            f = lambda x, w: conv_ops.sparse_conv_up2(x, w, L, coarse=coarse)
            t = timeit(f, x, w)
        n = L.num_padded
        gather_gb = 27 * n * cin * 2 / 1e9 if kind == "k3" else 8 * n * cin * 2 / 1e9
        print(f"{name}: {t*1e3:6.1f}ms  (gather {gather_gb:.2f}GB -> "
              f"{gather_gb/max(t,1e-9):.0f}GB/s apparent)")


if __name__ == "__main__":
    main()
