"""Measure per-(out-tile, offset) neighbor index spans on the bench scene.

Decides the windowed-select conv kernel's window sizes: for each level and
each k3 offset, the in-row indices of a tile's outputs are monotone in the
level's sort order, so a [win_start, win_start + W) contiguous window covers
them IF the span is bounded. This prints span percentiles per offset class
and the spill fraction for candidate window sizes.

  python benchmarks/measure_spans.py [--tile 256]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--points", type=int, default=250_000)
    args = ap.parse_args()
    T = args.tile

    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene

    scene = make_scene(num_points=args.points, num_objects=12, extent=8.0,
                       seed=0)
    batch, meta = FreeMaskCollator(voxel_size=0.02, fine_buckets=True)([scene])

    for lv, L in enumerate(batch.graph.levels):
        n_pad = L.num_padded
        nbr = np.asarray(L.nbr_idx)              # (27, N)
        valid_n = nbr != (n_pad - 1)
        n_tiles = n_pad // T
        print(f"\n=== level {lv}: n_pad={n_pad} tiles={n_tiles} "
              f"valid_rows={int(np.asarray(L.valid).sum())}")
        classes = {}
        for k in range(27):
            if k == 13:
                continue
            dz, rem = divmod(k, 9)
            dy, dx = divmod(rem, 3)
            off = (dz - 1, dy - 1, dx - 1)
            nz = tuple(i for i, d in enumerate(off) if d != 0)
            cls = "".join("zyx"[i] for i in nz)
            idx = nbr[k].reshape(n_tiles, T)
            v = valid_n[k].reshape(n_tiles, T)
            big = np.where(v, idx, np.int64(2**31))
            small = np.where(v, idx, np.int64(-1))
            mx = small.max(axis=1)
            mn = big.min(axis=1)
            has = v.any(axis=1)
            span = np.where(has, mx - mn + 1, 0)
            s = span[has]
            if len(s) == 0:
                continue
            classes.setdefault(cls, []).append(
                (off, np.percentile(s, 50), np.percentile(s, 95),
                 np.percentile(s, 99), s.max(),
                 # spill fraction for candidate windows (pairs outside
                 # [mn, mn + W))
                 [float(np.mean((idx - mn[:, None] >= W)[v]))
                  for W in (int(1.5 * T), 2 * T, 4 * T, 8 * T)])
            )
        for cls in sorted(classes, key=len):
            rows = classes[cls]
            print(f"  class {cls or 'center'} ({len(rows)} offsets):")
            for off, p50, p95, p99, smax, spills in rows:
                sp = " ".join(f"{x*100:.2f}%" for x in spills)
                print(f"    {off}: span p50={p50:.0f} p95={p95:.0f} "
                      f"p99={p99:.0f} max={smax}  spill@[1.5T,2T,4T,8T]={sp}")


if __name__ == "__main__":
    main()
