"""TPU smoke for the windowed-conv BACKWARD: executes window_conv3_dw and
the full custom VJP on the real chip and checks both against the CPU/XLA
oracle (VERDICT r3: the dW kernel failed Mosaic lowering, so the windowed
backward had never run on TPU).

Run: python benchmarks/tpu_window_vjp_smoke.py   (needs the TPU backend)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops import conv_ops
    from unscene3d_tpu.ops.window_conv import build_win_graph, window_conv3

    assert jax.default_backend() != "cpu", "needs the TPU backend"
    rng = np.random.RandomState(0)
    cin = cout = 32

    results = {}
    # spill-forced uses a smaller scene: a tiny union on a large scene spills
    # ~8% of all pairs, far past the <0.5% the compact-table design (and its
    # VMEM residency) is for
    for name, n_points, kw in [
        ("default", 60_000, dict(w_sub=384, w_union=4096)),
        ("spill-forced", 9_000, dict(w_sub=256, w_union=512)),
    ]:
        scene = make_scene(num_points=n_points, num_objects=6, extent=5.0,
                           seed=7)
        batch, _ = FreeMaskCollator(voxel_size=0.02)([scene])
        level = batch.graph.levels[0]
        n_pad = level.num_padded
        kw["w_union"] = min(kw["w_union"], n_pad)
        wg = build_win_graph(np.asarray(level.nbr_idx), n_pad, **kw)
        x = jnp.asarray(rng.randn(n_pad, cin), jnp.float32)
        x = x * level.valid[:, None].astype(x.dtype)
        w = jnp.asarray(rng.randn(27, cin, cout) * 0.1, jnp.float32)

        def f_win(x, w, wg=wg):
            return (window_conv3(x, w, wg, level.valid) ** 2).sum()

        def f_ref(x, w):
            return (conv_ops.sparse_conv3(x, w, level, impl="scan") ** 2).sum()

        g_fn = jax.jit(jax.grad(f_win, argnums=(0, 1)))
        t0 = time.perf_counter()
        gx_w, gw_w = g_fn(x, w)
        gx_w, gw_w = np.asarray(gx_w), np.asarray(gw_w)  # sync
        compile_s = time.perf_counter() - t0
        gx_r, gw_r = jax.jit(jax.grad(f_ref, argnums=(0, 1)))(x, w)
        ex = float(np.abs(gx_w - np.asarray(gx_r)).max())
        ew = float(np.abs(gw_w - np.asarray(gw_r)).max())
        sx = float(np.abs(np.asarray(gx_r)).max())
        sw = float(np.abs(np.asarray(gw_r)).max())
        n_spill = int((np.asarray(wg.spill_out) != n_pad - 1).sum())
        print(f"[{name}] spills={n_spill} compile+run={compile_s:.1f}s "
              f"gx err {ex:.2e} (scale {sx:.1f})  gw err {ew:.2e} "
              f"(scale {sw:.1f})")
        ok = ex < 1e-2 * max(sx, 1) and ew < 1e-2 * max(sw, 1)
        results[name] = ok
        assert ok, f"{name}: windowed VJP disagrees with the gather oracle"
    print("window VJP TPU smoke OK:", results)


if __name__ == "__main__":
    main()
