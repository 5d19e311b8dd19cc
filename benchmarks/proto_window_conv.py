"""Prototype: windowed-select k3 sparse conv (design study for ops/window_conv).

Idea: levels are sorted by (b,x,y,z) ravel key, so for ANY k3 offset the
neighbors of a 256-row out-tile lie in a small contiguous index window
(measured on the bench scene: per-offset span p99 <= 510, union span <=
~2048 -- benchmarks/measure_spans.py). So instead of HBM row-gathers
(~0.3 Grows/s, the round-2 bottleneck):

  * DMA ONE sliding union window of x rows per tile (streaming bandwidth),
  * per offset, slice a W-row sub-window from it in VMEM and select the
    tile's neighbor rows with a one-hot (T x W) MXU matmul (exact),
  * accumulate the 27 offset GEMMs in f32, epilogue as usual.

Pairs outside their sub-window (<1% measured) spill to a tiny XLA
segment-sum path.

  python benchmarks/proto_window_conv.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

T = 256



def main():
    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops import conv_ops
    from unscene3d_tpu.ops.window_conv import build_win_graph, window_conv3_fwd
    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import os as _os
    _group = int(_os.environ.get("GROUP", 1))
    scene = make_scene(num_points=250_000, num_objects=12, extent=8.0, seed=0)
    batch, meta = FreeMaskCollator(voxel_size=0.02, fine_buckets=True,
                                   win_levels=(0,) if _group > 1 else (),
                                   win_group=_group)([scene])
    level = batch.graph.levels[0]
    n_pad = level.num_padded
    nbr = np.asarray(level.nbr_idx)
    t0 = time.perf_counter()
    import os
    w_sub = int(os.environ.get("W_SUB", 512))
    w_union = int(os.environ.get("W_UNION", 4096))
    cin_env = int(os.environ.get("CIN", 96))
    group = int(os.environ.get("GROUP", 1))
    wg = build_win_graph(nbr, n_pad, w_sub=w_sub, w_union=w_union,
                         group=group)
    n_valid_pairs = int((nbr != (n_pad - 1)).sum()) - n_pad
    print(f"host build {time.perf_counter()-t0:.2f}s  "
          f"spill_pad={wg.num_spill_padded} "
          f"({100*wg.num_spill_padded/max(n_valid_pairs,1):.3f}% of pairs)")

    cin = cout = cin_env
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n_pad, cin), jnp.bfloat16)
    x = x * jnp.asarray(np.asarray(level.valid))[:, None].astype(x.dtype)
    w = jnp.asarray(rng.randn(27, cin, cout) * 0.05, jnp.bfloat16)

    level_dev = jax.tree.map(jnp.asarray, level)
    valid = level_dev.valid
    ref_fn = jax.jit(lambda x, w: conv_ops.sparse_conv3(x, w, level_dev, impl="unroll"))
    ref = np.asarray(ref_fn(x, w).astype(jnp.float32))

    wg_dev = jax.tree.map(jnp.asarray, wg)
    win_fn = jax.jit(lambda x, w: window_conv3_fwd(x, w, wg_dev, valid))
    got = np.asarray(win_fn(x, w).astype(jnp.float32))

    vmask = np.asarray(level.valid)
    err = np.abs(got[vmask] - ref[vmask])
    den = np.maximum(np.abs(ref[vmask]), 1.0)
    print(f"max abs err {err.max():.4f}  max rel {np.max(err/den):.4f}")

    # ---- timing: K chained reps
    K = 8

    def rep(fn):
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

    t_win = rep(lambda x, w: window_conv3_fwd(x, w, wg_dev, valid))
    t_win_fused = rep(lambda x, w: window_conv3_fwd(
        x, w, wg_dev, valid,
        scale=jnp.ones((cout,), jnp.float32),
        shift=jnp.zeros((cout,), jnp.float32), relu=True))
    t_scan = rep(lambda x, w: conv_ops.sparse_conv3(x, w, level_dev, impl="scan"))
    t_unroll = rep(lambda x, w: conv_ops.sparse_conv3(x, w, level_dev, impl="unroll"))
    print(f"L0 conv {cin}->{cout}: window {t_win*1e3:.2f}ms  "
          f"window+bnrelu {t_win_fused*1e3:.2f}ms  "
          f"scan {t_scan*1e3:.2f}ms  unroll {t_unroll*1e3:.2f}ms")


if __name__ == "__main__":
    main()
