"""A/B the conv engines in TRAINING (fwd+bwd+matcher+loss+optimizer) on the
real chip (VERDICT r3 next#1: the windowed engine's backward had never run
on TPU, so 'the window VJP loses to scan convs in training' was recorded but
never measurable; its dW kernel and dx spill handling are fixed in r4).

Usage: python benchmarks/ab_train_engine.py [num_points] [batch] [steps]
Reference workload being modeled: Res16UNet34C fwd+bwd at batch 8 x ~100k
voxels (/root/reference/scripts/unsupervised/train_unscene3d.sh:17,
models/res16unet.py:224-297).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(engine: str, num_points: int, batch: int, steps: int) -> float:
    import jax

    from main_instance_segmentation import build_experiment, get_parameters
    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    # win engine at L0-2 only: the f32 train kernels at 256-channel levels
    # need (2, w_union, 256) f32 double-buffered VMEM scratch (~24MB > the
    # 16MB budget) -- the deep levels keep scan convs
    win = "[]" if engine == "scan" else "[0,1,2]"
    cfg = get_parameters([
        "data/datasets=synthetic",
        f"data.batch_size={batch}",
        "data.voxel_size=0.02",
        f"data.win_levels={win}",
        f"data.datasets.train_dataset.num_scenes={batch}",
        f"data.datasets.train_dataset.num_points={num_points}",
        "data.datasets.train_dataset.extent=6.0",
        "data.datasets.train_dataset.num_objects=10",
        "data.datasets.validation_dataset.num_scenes=1",
        "general.save_dir=/tmp/unscene3d_ab_train",
        "trainer.max_epochs=1",
    ])
    exp = build_experiment(cfg)
    batch_d = exp._example_batch()
    batch_d = jax.tree.map(jax.device_put, batch_d)
    state = exp.trainer.init_state(batch_d, seed=0)
    step_fn = exp.trainer.build_train_step()
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, losses = step_fn(state, batch_d, rng)
    float(np.asarray(losses["total"]))
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        state, losses = step_fn(state, batch_d, rng)
        total = float(np.asarray(losses["total"]))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"[ab_train] engine={engine} batch={batch} x {num_points}pts: "
          f"{dt*1e3:.0f} ms/step (compile+1st {compile_s:.0f}s, "
          f"loss {total:.2f}, finite={np.isfinite(total)})",
          flush=True)
    return dt


def main():
    num_points = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    res = {}
    for engine in ("win", "scan"):
        res[engine] = run(engine, num_points, batch, steps)
    ratio = res["scan"] / res["win"]
    print(f"[ab_train] win is {ratio:.2f}x the scan engine "
          f"({'WINS' if ratio > 1 else 'loses'})")


if __name__ == "__main__":
    main()
