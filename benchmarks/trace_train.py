"""Per-op device trace of ONE flagship train step (fwd+bwd+optimizer),
aggregated by op category -- finds where the training-step time goes
(reference workload: trainer/trainer.py:99-163, batch 8).

  python benchmarks/trace_train.py [--batch 4] [--out /tmp/jaxtrace_train]

Reuses trace_fwd.parse_trace for the aggregation.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from trace_fwd import parse_trace  # noqa: E402


def run_and_trace(batch: int, out_dir: str, reps: int = 3, win: str = "[]",
                  dtype: str = "float32"):
    import jax

    from main_instance_segmentation import build_experiment, get_parameters
    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_parameters([
        "data/datasets=synthetic",
        f"data.batch_size={batch}",
        "data.voxel_size=0.02",
        f"data.win_levels={win}",
        f"model.dtype={dtype}",
        "data.num_workers=0",
        f"data.datasets.train_dataset.num_scenes={batch}",
        "data.datasets.train_dataset.num_points=125000",
        "data.datasets.train_dataset.extent=8.0",
        "data.datasets.train_dataset.num_objects=12",
        "data.datasets.validation_dataset.num_scenes=1",
        "general.save_dir=/tmp/unscene3d_trace_train",
        "trainer.max_epochs=1",
    ])
    exp = build_experiment(cfg)
    batch_d = jax.tree.map(jax.device_put, exp._example_batch())
    state = exp.trainer.init_state(batch_d, seed=0)
    step_fn = exp.trainer.build_train_step()
    rng = jax.random.PRNGKey(0)
    state, losses = step_fn(state, batch_d, rng)
    float(np.asarray(losses["total"]))  # compile + first step
    t0 = time.perf_counter()
    state, losses = step_fn(state, batch_d, rng)
    float(np.asarray(losses["total"]))
    print(f"warm step: {(time.perf_counter()-t0)*1e3:.0f}ms", file=sys.stderr)
    with jax.profiler.trace(out_dir):
        for _ in range(reps):
            state, losses = step_fn(state, batch_d, rng)
            float(np.asarray(losses["total"]))
    return reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--win", default="[]",
                    help="data.win_levels, e.g. [0,1,2,3,4]")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", default="/tmp/jaxtrace_train")
    args = ap.parse_args()
    run_and_trace(args.batch, args.out, win=args.win, dtype=args.dtype)
    parse_trace(args.out)


if __name__ == "__main__":
    main()
