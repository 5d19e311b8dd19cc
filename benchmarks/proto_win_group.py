"""A/B: grouped union-window DMA (window_conv group=G) vs per-tile (G=1).

Checks the G>1 Pallas kernel bitwise against G=1 on the bench scene's L0
topology and times both (chained in-graph reps; the dev tunnel's ~29ms
relay round-trip stays out of the measurement).

  GROUPS="1 8" CIN=128 python benchmarks/proto_win_group.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops.window_conv import build_win_graph, window_conv3_fwd
    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    groups = [int(g) for g in os.environ.get("GROUPS", "1 8").split()]
    cin = cout = int(os.environ.get("CIN", 128))
    tile = int(os.environ.get("TILE", 256))
    w_sub = int(os.environ.get("W_SUB", 384))
    gmax = max(groups)

    scene = make_scene(num_points=250_000, num_objects=12, extent=8.0, seed=0)
    batch, _ = FreeMaskCollator(voxel_size=0.02, fine_buckets=True,
                                win_levels=(0,), win_group=gmax,
                                win_tile=tile)([scene])
    level = batch.graph.levels[0]
    n_pad = level.num_padded
    nbr = np.asarray(level.nbr_idx)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n_pad, cin), jnp.bfloat16)
    x = x * jnp.asarray(np.asarray(level.valid))[:, None].astype(x.dtype)
    w = jnp.asarray(rng.randn(27, cin, cout) * 0.05, jnp.bfloat16)
    valid = jnp.asarray(np.asarray(level.valid))
    scale = jnp.ones((cout,), jnp.float32)
    shift = jnp.zeros((cout,), jnp.float32)

    K = 8

    def timed(fn):
        def body(x, w):
            s = jnp.zeros((), jnp.float32)
            xx = x
            for _ in range(K):
                y = fn(xx, w)
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
        return float(np.median(ts)) / K

    ref = None
    for g in groups:
        t0 = time.perf_counter()
        wg = build_win_graph(nbr, n_pad, w_sub=w_sub,
                            w_union=4096 + (g - 1) * tile, group=g, tile=tile)
        wg = jax.tree.map(jnp.asarray, wg)
        tb = time.perf_counter() - t0
        fn = lambda x, w: window_conv3_fwd(x, w, wg, valid, scale=scale,
                                           shift=shift, relu=True)
        got = np.asarray(jax.jit(fn)(x, w).astype(jnp.float32))
        if ref is None:
            ref = got
            err = 0.0
        else:
            err = float(np.abs(got - ref).max())
        t = timed(fn)
        print(f"G={g}: conv {cin}->{cout} {t*1e3:.2f}ms  "
              f"host_build {tb:.2f}s  spill={int(wg.num_spill_padded)}  "
              f"max|Δ| vs G={groups[0]}: {err:.5f}", flush=True)


if __name__ == "__main__":
    main()
