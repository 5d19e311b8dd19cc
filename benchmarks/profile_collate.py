"""Break down host collate time on the bench scene (VERDICT r3 weak#3).

Runs the bench's exact eval collator config on the 250k-point synthetic
scene and times each phase: quantize, neighbor maps, downsample maps, win
k3 tables, win k2 tables, pyramid bounds, FPS seeds, scene tables, rest.

Usage: python benchmarks/profile_collate.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main(reps: int = 3):
    from unscene3d_tpu.data.collate import FreeMaskCollator, fps_numpy
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.ops.hashing import sparse_quantize
    from unscene3d_tpu.ops.kernel_maps import (
        build_downsample_map,
        build_neighbor_map,
    )
    from unscene3d_tpu.ops.window_conv import build_win_graph
    from unscene3d_tpu.ops.window_gather import build_win_tables

    scene = make_scene(num_points=250_000, num_objects=12, extent=8.0, seed=0)
    coll = FreeMaskCollator(voxel_size=0.02, fine_buckets=True,
                            win_levels=(0, 1, 2, 3, 4), fps_queries=100)

    # end-to-end
    coll([scene])  # warm (native .so build, allocator)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        batch, _ = coll([scene])
        ts.append(time.perf_counter() - t0)
    print(f"total collate: {min(ts)*1e3:.0f} ms (best of {reps})")

    # phases
    xyz = np.asarray(scene["xyz"], np.float32)
    t0 = time.perf_counter()
    vox, umap, imap = sparse_quantize(xyz, 0.02)
    print(f"  quantize: {(time.perf_counter()-t0)*1e3:.0f} ms "
          f"({len(vox)} voxels)")

    coords = np.column_stack([np.zeros(len(vox), np.int32), vox])
    level_coords = [coords.astype(np.int64)]
    t0 = time.perf_counter()
    for _ in range(4):
        coarse, *_ = build_downsample_map(level_coords[-1])
        level_coords.append(coarse.astype(np.int64))
    print(f"  downsample maps: {(time.perf_counter()-t0)*1e3:.0f} ms")

    t0 = time.perf_counter()
    nbrs = [build_neighbor_map(lc.astype(np.int32)) for lc in level_coords]
    print(f"  k3 neighbor maps (native): {(time.perf_counter()-t0)*1e3:.0f} ms")

    from unscene3d_tpu.ops.sparse_graph import bucket_size
    pads = [bucket_size(len(lc) + 1, fine=True, align=2048)
            for lc in level_coords]
    t0 = time.perf_counter()
    for li, (lc, (idx, val)) in enumerate(zip(level_coords, nbrs)):
        n_pad = pads[li]
        if n_pad < 512:
            continue
        nbr = np.full((27, n_pad), n_pad - 1, np.int64)
        nbr[:, :len(lc)] = np.where(val, idx, n_pad - 1)
        build_win_graph(nbr, n_pad, w_sub=384,
                        w_union=min(4096 + 7 * 256, n_pad), group=8)
    print(f"  win k3 tables: {(time.perf_counter()-t0)*1e3:.0f} ms")

    b, _ = coll([scene])
    t0 = time.perf_counter()
    for li in range(1, 5):
        lvl = b.graph.levels[li]
        build_win_tables(np.asarray(lvl.child_idx), lvl.num_padded,
                         b.graph.levels[li - 1].num_padded)
    print(f"  win k2 down tables: {(time.perf_counter()-t0)*1e3:.0f} ms")

    c0 = np.asarray(b.graph.levels[0].coords[:, 1:], np.float32)
    t0 = time.perf_counter()
    fps_numpy(c0[b.scene_idx[0][0]], np.asarray(b.scene_valid[0][0]), 100)
    print(f"  fps seeds (host numpy): {(time.perf_counter()-t0)*1e3:.0f} ms")

    from unscene3d_tpu.data.collate import _host_coord_pyramid_bounds
    t0 = time.perf_counter()
    _host_coord_pyramid_bounds(b.graph, np.asarray(b.raw_coords), 1)
    print(f"  pyramid bounds: {(time.perf_counter()-t0)*1e3:.0f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
