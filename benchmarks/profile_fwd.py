"""Forward-pass profile on the real chip: backbone vs decoder split, CSR
level coverage, and multi-scene batching (levers toward the 5x north star).

  python benchmarks/profile_fwd.py [--variants base csr01 batch2 backbone]

Timings use the in-graph chained-repetition trick from bench.py (the dev
tunnel's block_until_ready returns early, and the ~29ms relay round-trip
must stay out of the measurement).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, *args, k=8, reps=3):
    import jax

    jfn = jax.jit(fn)
    float(jfn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*", default=["base", "backbone",
                                                      "csr01", "csr012",
                                                      "batch2"])
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from unscene3d_tpu.data.collate import FreeMaskCollator
    from unscene3d_tpu.data.synthetic import make_scene
    from unscene3d_tpu.models.backbone import Res16UNet34C
    from unscene3d_tpu.models.mask3d import Mask3D
    from unscene3d_tpu.utils.runtime import init_on_cpu

    dtype = jnp.bfloat16
    scene = make_scene(num_points=250_000, num_objects=12, extent=8.0, seed=0)
    K = args.k

    def build(csr_levels, n_scenes=1, win_levels=()):
        scenes = [scene if i == 0 else
                  make_scene(num_points=250_000, num_objects=12, extent=8.0,
                             seed=i) for i in range(n_scenes)]
        batch, meta = FreeMaskCollator(voxel_size=0.02, fine_buckets=True,
                                       csr_levels=csr_levels,
                                       win_levels=win_levels)(scenes)
        batch = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), batch)
        return batch, meta

    def rep_model(model, variables, batch, only_backbone=False):
        def rep(variables, batch):
            s = jnp.zeros((), jnp.float32)
            b = batch
            for _ in range(K):
                if only_backbone:
                    feats, _fpn, _final = model.backbone.apply(
                        variables, b.features, b.graph, train=False)
                    s = s + feats.astype(jnp.float32).sum()
                else:
                    out = model.apply(variables, b, train=False, is_eval=True)
                    s = s + out["pred_logits"].astype(jnp.float32).sum()
                b = b.replace(features=b.features +
                              (s * 1e-12).astype(b.features.dtype))
            return s
        return rep

    model = Mask3D(backbone=Res16UNet34C(out_channels=2, dtype=dtype),
                   num_classes=3, dtype=dtype)

    results = {}
    for variant in args.variants:
        win = ()
        if variant == "win":
            csr, win, n_scenes, backbone_only = (), (0, 1, 2, 3, 4), 1, False
        elif variant == "winbb":
            csr, win, n_scenes, backbone_only = (), (0, 1, 2, 3, 4), 1, True
        elif variant == "base":
            csr, n_scenes, backbone_only = (0,), 1, False
        elif variant == "backbone":
            csr, n_scenes, backbone_only = (0,), 1, True
        elif variant == "csr01":
            csr, n_scenes, backbone_only = (0, 1), 1, False
        elif variant == "csr012":
            csr, n_scenes, backbone_only = (0, 1, 2), 1, False
        elif variant == "batch2":
            csr, n_scenes, backbone_only = (0,), 2, False
        elif variant == "nocsr":
            csr, n_scenes, backbone_only = (), 1, False
        elif variant in ("fused", "fused012"):
            from unscene3d_tpu.ops import conv_ops

            conv_ops.set_default_k3_impl("fused")
            csr = (0,) if variant == "fused" else (0, 1, 2)
            n_scenes, backbone_only = 1, False
        else:
            print(f"unknown variant {variant}", file=sys.stderr)
            continue
        batch, meta = build(csr, n_scenes, win_levels=win)
        variables = init_on_cpu(
            model.init,
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            batch, train=False, is_eval=True)
        if backbone_only:
            variables_b = {"params": variables["params"]["backbone"]}
            if "batch_stats" in variables:
                variables_b["batch_stats"] = variables["batch_stats"]["backbone"]
            fn = rep_model(model, variables_b, batch, only_backbone=True)
            dt = timeit(fn, variables_b, batch, k=K)
        else:
            fn = rep_model(model, variables, batch)
            dt = timeit(fn, variables, batch, k=K)
        if variant.startswith("fused"):
            from unscene3d_tpu.ops import conv_ops

            conv_ops.set_default_k3_impl("scan")   # don't leak into later variants
        per_scene = dt / n_scenes
        results[variant] = per_scene
        print(f"[{variant}] {dt*1e3:.1f}ms/fwd, {per_scene*1e3:.1f}ms/scene "
              f"({1/per_scene:.2f} scenes/s), pad={batch.graph.levels[0].num_padded}",
              file=sys.stderr)
    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
