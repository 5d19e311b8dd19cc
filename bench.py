"""Benchmark: flagship Mask3D inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: eval-mode forward (Res16UNet34C backbone + 100-query / 3-shared-
decoder mask transformer, full-resolution attention) on a synthetic scene
sized like a ScanNet 2cm-voxel scan (~100k voxels), matching the reference's
class-agnostic inference path (trainer/trainer.py:359-440).

Baseline: the reference publishes no throughput numbers (BASELINE.md). We use
an estimated 4.0 scenes/s for the reference's MinkowskiEngine inference on an
RTX A6000 (Res16UNet34C @ ~100k voxels: ~150-200ms backbone + decoder + copy
overheads); vs_baseline = ours / 4.0. Revisit once the reference path is
measured directly.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SCENES_PER_SEC = 4.0


def main():
    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.models.backbone import Res16UNet34C
    from unscene3d_tpu.models.mask3d import Mask3D

    dtype = jnp.bfloat16
    model = Mask3D(
        backbone=Res16UNet34C(out_channels=2, dtype=dtype),
        num_classes=3,
        dtype=dtype,
    )

    # ~100k voxels at 2cm: dense 250k-point scene over a 8m room
    scene = make_scene(num_points=250_000, num_objects=12, extent=8.0, seed=0)
    t_host0 = time.perf_counter()
    batch, meta = FreeMaskCollator(voxel_size=0.02)(
        [scene]
    )
    host_collate_s = time.perf_counter() - t_host0
    n_vox = meta.num_voxels[0]

    from unscene3d_tpu.utils.runtime import init_on_cpu

    variables = init_on_cpu(
        model.init,
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch, train=False, is_eval=True,
    )

    @jax.jit
    def fwd(variables, batch):
        return model.apply(variables, batch, train=False, is_eval=True)

    # device-resident batch: steady-state measures device compute; input
    # transfer overlaps compute in the real pipeline (and the axon dev tunnel's
    # ~50MB/s is not representative of a TPU host's PCIe)
    t0 = time.perf_counter()
    batch = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), batch)
    jax.block_until_ready(batch.features)
    transfer_s = time.perf_counter() - t0

    # warmup / compile
    out = fwd(variables, batch)
    finite = bool(jnp.isfinite(out["pred_logits"].astype(jnp.float32)).all())

    @jax.jit
    def fwd_scalar(variables, batch):
        out = model.apply(variables, batch, train=False, is_eval=True)
        return out["pred_logits"].astype(jnp.float32).sum()

    float(fwd_scalar(variables, batch))  # compile
    iters = 10
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        # fetching a scalar forces real completion (block_until_ready through
        # the axon relay returns early)
        float(fwd_scalar(variables, batch))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    scenes_per_sec = 1.0 / dt

    print(
        f"[bench] voxels={n_vox} device_fwd={dt*1e3:.1f}ms "
        f"host_collate={host_collate_s*1e3:.0f}ms "
        f"h2d_transfer={transfer_s*1e3:.0f}ms finite={finite} "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "mask3d_inference_scenes_per_sec",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
