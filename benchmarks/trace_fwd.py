"""Per-op device trace of the eval forward (jax.profiler), aggregated by op
category -- finds what remains in the windowed-engine forward.

  python benchmarks/trace_fwd.py [--variants win] [--backbone]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_and_trace(backbone_only: bool, win_levels, out_dir: str):
    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.models.backbone import Res16UNet34C
    from unscene3d_tpu.models.mask3d import Mask3D
    from unscene3d_tpu.utils.runtime import enable_compilation_cache, init_on_cpu

    enable_compilation_cache()
    dtype = jnp.bfloat16
    scene = make_scene(num_points=250_000, num_objects=12, extent=8.0, seed=0)
    batch, meta = FreeMaskCollator(voxel_size=0.02, fine_buckets=True,
                                   win_levels=win_levels)([scene])
    batch = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), batch)
    model = Mask3D(backbone=Res16UNet34C(out_channels=2, dtype=dtype),
                   num_classes=3, dtype=dtype)
    variables = init_on_cpu(
        model.init,
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch, train=False, is_eval=True)

    if backbone_only:
        variables = {"params": variables["params"]["backbone"],
                     "batch_stats": variables.get("batch_stats", {}).get("backbone", {})}

        def fwd(v, b):
            feats, _f, _l = model.backbone.apply(v, b.features, b.graph,
                                                 train=False)
            return feats.astype(jnp.float32).sum()
    else:
        def fwd(v, b):
            out = model.apply(v, b, train=False, is_eval=True)
            return out["pred_logits"].astype(jnp.float32).sum()

    jfwd = jax.jit(fwd)
    float(jfwd(variables, batch))      # compile
    float(jfwd(variables, batch))
    with jax.profiler.trace(out_dir):
        for _ in range(3):
            float(jfwd(variables, batch))


def parse_trace(out_dir: str):
    files = sorted(glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace files found", file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pick pids whose process name mentions TPU/device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        if not name or dur <= 0:
            continue
        key = re.sub(r"[.\d]+$", "", name)
        agg[key] += dur
        total += dur
    print(f"device total {total:.1f}ms over 3 reps ({total/3:.1f}ms/rep) "
          f"[pids: {sorted(pid_names.items())}]")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:28]:
        print(f"  {v/3:8.2f}ms  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", action="store_true")
    ap.add_argument("--out", default="/tmp/jaxtrace")
    args = ap.parse_args()
    run_and_trace(args.backbone, (0, 1, 2, 3, 4), args.out)
    parse_trace(args.out)


if __name__ == "__main__":
    main()
