"""Validate the fused dx+dW backward kernel on REAL TPU vs the unfused path.

The interpret-mode oracle test (tests/test_window_conv.py::
test_interpret_bwd_fused_matches_oracle) proves the math; this script proves
Mosaic compiles and executes the kernel correctly on hardware at the dtypes
and channel widths the flagship training step uses, and reports the timing
delta fused vs unfused.

Run on the dev chip:  python benchmarks/tpu_fused_bwd_check.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from unscene3d_tpu.ops import window_conv as wc
from unscene3d_tpu.ops.kernel_maps import build_neighbor_map
from unscene3d_tpu.ops.window_conv import build_win_graph, window_conv3


def make_graph(n_points: int, n_pad: int, seed: int, extent: int,
               w_sub: int, w_union: int, group: int):
    rng = np.random.RandomState(seed)
    pts = rng.randint(0, extent, size=(n_points, 3))
    coords = np.unique(np.concatenate(
        [np.zeros((len(pts), 1), np.int64), pts], axis=1), axis=0)
    order = np.lexsort(coords.T[::-1])
    coords = coords[order]
    n = len(coords)
    assert n < n_pad, (n, n_pad)
    idx, val = build_neighbor_map(coords.astype(np.int32))
    nbr = np.full((27, n_pad), n_pad - 1, np.int64)
    nbr[:, :n] = np.where(val, idx, n_pad - 1)
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    return build_win_graph(nbr, n_pad, w_sub=w_sub, w_union=w_union,
                           group=group), jnp.asarray(valid)


def run_case(name, cin, cout, dtype, n_points, n_pad, extent, w_sub,
             w_union, group, seed=0):
    wg, valid = make_graph(n_points, n_pad, seed, extent, w_sub, w_union,
                           group)
    rng = np.random.RandomState(seed + 1)
    x = jnp.asarray(rng.randn(n_pad, cin), dtype)
    x = x * valid[:, None].astype(x.dtype)
    w = jnp.asarray(rng.randn(27, cin, cout) * 0.05, dtype)
    g = jnp.asarray(rng.randn(n_pad, cout), dtype)

    def loss(x, w):
        return (window_conv3(x, w, wg, valid).astype(jnp.float32)
                * g.astype(jnp.float32)).sum()

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))

    wc._FUSED_BWD = True
    dx_f, dw_f = jax.block_until_ready(grad(x, w))
    t0 = time.perf_counter()
    for _ in range(10):
        out = grad(x, w)
    jax.block_until_ready(out)
    t_f = (time.perf_counter() - t0) / 10

    wc._FUSED_BWD = False
    # custom_vjp's bwd is traced under jit, so a fresh jit identity picks up
    # the toggled path; warm it OUTSIDE the timed loop
    fn = jax.jit(lambda a, b: jax.grad(loss, argnums=(0, 1))(a, b))
    dx_u, dw_u = jax.block_until_ready(fn(x, w))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(x, w)
    jax.block_until_ready(out)
    t_u = (time.perf_counter() - t0) / 10
    wc._FUSED_BWD = True

    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-3
    dxe = float(jnp.max(jnp.abs(dx_f.astype(jnp.float32)
                                - dx_u.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(dx_u.astype(jnp.float32)))) + 1e-6
    dwe = float(jnp.max(jnp.abs(dw_f.astype(jnp.float32)
                                - dw_u.astype(jnp.float32))))
    wscale = float(jnp.max(jnp.abs(dw_u.astype(jnp.float32)))) + 1e-6
    ok = dxe / scale < tol and dwe / wscale < tol
    print(f"[{name}] cin={cin} cout={cout} {np.dtype(dtype).name} "
          f"spill={int(wg.num_spill_padded)} rel_dx={dxe/scale:.2e} "
          f"rel_dw={dwe/wscale:.2e} fused={t_f*1e3:.2f}ms "
          f"unfused={t_u*1e3:.2f}ms {'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    ok = True
    # flagship-ish widths (Res16UNet34C level channels) at both dtypes
    for dtype in (jnp.float32, jnp.bfloat16):
        ok &= run_case("lvl0", 32, 32, dtype, 60_000, 65536, 64,
                       w_sub=1536, w_union=3072, group=8)
        ok &= run_case("lvl2", 128, 128, dtype, 20_000, 32768, 32,
                       w_sub=1024, w_union=2048, group=8)
        ok &= run_case("spilly", 96, 96, dtype, 12_000, 16384, 20,
                       w_sub=384, w_union=768, group=4)
    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
