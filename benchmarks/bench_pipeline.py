"""Steady-state host-pipeline benchmark: can the multi-worker Prefetcher
keep an N-shard device step fed? (VERDICT r1 #9)

Simulates the device step as a sleep (TPU compute consumes no host CPU, so
overlap is what matters) and measures the consumer's blocked time. Reports
one JSON line with the device idle fraction at steady state.

  python benchmarks/bench_pipeline.py [--shards 8] [--workers 4]
      [--steps 20] [--step_ms 500] [--points 40000]

Interpretation: idle_frac < 0.10 means the pipeline hides collation behind
device compute at this shard count. On a single-core host the aggregate
producer rate is bounded by the core, so --points sets the scene size the
host can actually sustain; on a real multi-host TPU pod each host feeds only
its own shards with its own cores.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--step_ms", type=float, default=500.0)
    ap.add_argument("--points", type=int, default=40000)
    args = ap.parse_args()

    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.train.experiment import Prefetcher

    scenes = [make_scene(num_points=args.points, num_objects=6, extent=6.0,
                         seed=s) for s in range(4)]
    collator = FreeMaskCollator(voxel_size=0.02)

    # probe pad plan (+ headroom) so every batch collates to fixed shapes
    from unscene3d_tpu.ops.sparse_graph import bucket_size

    plans = []
    for s in scenes:
        b, _ = collator([s])
        plans.append(collator.pad_plan(b))
    merged = collator.merge_pad_plans(plans)

    def grow(v):
        return bucket_size(int(v * 1.15) + 1) if v else 0

    pads = dict(
        levels=[grow(v) for v in merged["levels"]],
        bricks=[(bucket_size(int(v * 1.15) + 1, align=8, min_size=8) if v else 0)
                for v in merged["bricks"]],
        scene_n=[grow(v) for v in merged["scene_n"]],
        s_max=grow(merged["s_max"]), t_max=grow(merged["t_max"]),
        n_pix=grow(merged["n_pix"]))

    rng = np.random.RandomState(0)
    step_ids = [[int(rng.randint(len(scenes)))] for _ in range(args.shards)]

    def make_batch(i):
        shard_lists = [[scenes[j] for j in ids] for ids in step_ids]
        shards, _ = collator.collate_shards(shard_lists, pads=pads)
        return shards

    # producer-only rate
    t0 = time.perf_counter()
    make_batch(0)
    per_batch = time.perf_counter() - t0

    pf = Prefetcher(make_batch, args.steps, to_device=False,
                    num_workers=args.workers)
    t_consume_start = None
    for batch in pf:
        if t_consume_start is None:
            # warmup batch excluded from idle accounting
            t_consume_start = time.perf_counter()
        time.sleep(args.step_ms / 1000.0)  # the device step

    wall = time.perf_counter() - t_consume_start
    steps_timed = args.steps - 1
    ideal = steps_timed * args.step_ms / 1000.0
    idle_frac = max(0.0, (wall - ideal) / wall)
    print(f"[pipeline] collate {per_batch*1e3:.0f}ms/batch x {args.shards} "
          f"shards, step {args.step_ms:.0f}ms, workers={args.workers}: "
          f"wall {wall:.2f}s vs ideal {ideal:.2f}s", file=sys.stderr)
    print(json.dumps({"metric": "host_pipeline_device_idle_frac",
                      "value": round(idle_frac, 4), "unit": "fraction",
                      "shards": args.shards, "workers": args.workers,
                      "collate_ms_per_batch": round(per_batch * 1e3, 1)}))


if __name__ == "__main__":
    main()
