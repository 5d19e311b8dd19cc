"""Component benchmarks (informal; the driver-facing headline is bench.py).

  python benchmarks/bench_components.py [backbone|decoder|train|ncut|collate|all]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(f, *args, n=8):
    """Per-call scalar-fetch timing: block_until_ready through the axon relay
    returns early, so we force completion by fetching a scalar."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def scalarize(out):
        leaves = jax.tree.leaves(out)
        return float(leaves[0].reshape(-1)[0])

    scalarize(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        scalarize(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def setup(num_points=250_000):
    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene

    scene = make_scene(num_points=num_points, num_objects=12, extent=8.0, seed=0)
    t0 = time.perf_counter()
    batch, meta = FreeMaskCollator(voxel_size=0.02)([scene])
    t_collate = time.perf_counter() - t0
    return scene, batch, meta, t_collate


def main():
    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.models.backbone import Res16UNet34C
    from unscene3d_tpu.models.mask3d import Mask3D

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dtype = jnp.bfloat16
    scene, batch, meta, t_collate = setup()
    print(f"collate(host): {t_collate*1e3:.0f}ms  voxels={meta.num_voxels[0]}")

    if which in ("backbone", "all"):
        bb = Res16UNet34C(out_channels=2, dtype=dtype)
        v = bb.init(jax.random.PRNGKey(0), batch.features, batch.graph)
        f = jax.jit(lambda v, x, g: bb.apply(v, x, g, train=False))
        t = timeit(f, v, batch.features, batch.graph)
        print(f"backbone fwd: {t*1e3:.1f}ms")

    if which in ("decoder", "all"):
        model = Mask3D(backbone=Res16UNet34C(out_channels=2, dtype=dtype),
                       num_classes=3, dtype=dtype)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "sample": jax.random.PRNGKey(1)}, batch,
                       train=False, is_eval=True)
        f = jax.jit(lambda v, b: model.apply(v, b, train=False, is_eval=True))
        t = timeit(f, v, batch)
        print(f"full eval fwd: {t*1e3:.1f}ms")

    if which in ("train", "all"):
        from unscene3d_tpu.data.synthetic import make_batch
        from unscene3d_tpu.data.collate import FreeMaskCollator
        from unscene3d_tpu.losses.criterion import SetCriterion
        from unscene3d_tpu.losses.matcher import HungarianMatcher
        from unscene3d_tpu.train.loop import Trainer, make_optimizer

        tb, _ = FreeMaskCollator(voxel_size=0.02)(make_batch(4, num_points=60_000))
        model = Mask3D(backbone=Res16UNet34C(out_channels=2, dtype=dtype),
                       num_classes=3, dtype=dtype)
        trainer = Trainer(model, SetCriterion(matcher=HungarianMatcher(), num_classes=3),
                          make_optimizer(total_steps=100))
        state = trainer.init_state(tb)
        step = trainer.build_train_step()
        rng = jax.random.PRNGKey(0)
        tb = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), tb)
        state, _ = step(state, tb, rng)  # compile
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            state, losses = step(state, tb, jax.random.fold_in(rng, i))
            float(losses["total"])
            ts.append(time.perf_counter() - t0)
        import numpy as _np
        print(f"train step (4 scenes x ~40k vox): {_np.median(ts)*1e3:.0f}ms")

    if which in ("ncut", "all"):
        from unscene3d_tpu.pseudo.ncut import BatchedNCut, NCutConfig

        r = np.random.RandomState(0)
        scenes = []
        for b in range(8):
            s = 400  # segments per scene, realistic ScanNet count
            feats = r.randn(s, 96).astype(np.float32)
            uniq = np.arange(s)
            conn = np.column_stack([np.arange(s - 1), np.arange(1, s)])
            conn = np.vstack([conn, conn[:, ::-1]])
            seg_ids = np.repeat(uniq, 5)
            coords = r.rand(len(seg_ids), 3).astype(np.float32) * 8
            scenes.append(dict(features=feats, unique_segments=uniq,
                               connectivity=conn, segment_ids=seg_ids, coords=coords))
        BatchedNCut(NCutConfig()).run(scenes)  # compile
        t0 = time.perf_counter()
        BatchedNCut(NCutConfig()).run(scenes)
        dt = time.perf_counter() - t0
        print(f"ncut 8 scenes x 400 segs (warm): {dt:.2f}s ({8/dt:.2f} scenes/s)")


if __name__ == "__main__":
    main()
