"""Synthetic indoor-like scenes for tests and benchmarks.

Plays the role the oracle freemask dataset plays in the reference's test
strategy (datasets/preprocessing/freemask_preprocessing.py:188-192 builds
GT-derived pseudo masks so the pipeline can be validated with perfect masks):
a floor plane plus axis-aligned box "objects", each object = one instance
mask, segments = a coarse spatial clustering.
"""

from __future__ import annotations

import numpy as np


def make_scene(
    num_points: int = 20000,
    num_objects: int = 8,
    extent: float = 6.0,
    seed: int = 0,
    name: str | None = None,
) -> dict:
    r = np.random.RandomState(seed)
    n_floor = num_points // 3
    n_obj = num_points - n_floor

    floor = np.column_stack([
        r.uniform(0, extent, n_floor),
        r.uniform(0, extent, n_floor),
        r.uniform(0, 0.05, n_floor),
    ])

    obj_pts, obj_ids = [], []
    per_obj = n_obj // num_objects
    for k in range(num_objects):
        center = r.uniform(0.5, extent - 0.5, 2)
        size = r.uniform(0.3, 1.0, 3)
        pts = np.column_stack([
            r.uniform(-size[0] / 2, size[0] / 2, per_obj) + center[0],
            r.uniform(-size[1] / 2, size[1] / 2, per_obj) + center[1],
            r.uniform(0, size[2], per_obj) + 0.05,
        ])
        obj_pts.append(pts)
        obj_ids.append(np.full(per_obj, k))
    xyz = np.concatenate([floor] + obj_pts).astype(np.float32)
    inst = np.concatenate([np.full(n_floor, -1)] + obj_ids)

    # colors: per-instance base color + noise
    base = r.uniform(0, 1, (num_objects + 1, 3))
    colors = base[inst + 1] + r.normal(0, 0.05, (len(xyz), 3))
    colors = colors.clip(0, 1).astype(np.float32)

    # segments: spatial grid cells (stand-in for Felzenszwalb oversegmentation)
    cell = 0.5
    gs = np.floor(xyz / cell).astype(np.int64)
    keys = (gs[:, 0] + 100) * 10**6 + (gs[:, 1] + 100) * 10**3 + (gs[:, 2] + 100)
    _, segments = np.unique(keys, return_inverse=True)

    masks = np.zeros((len(xyz), num_objects), bool)
    for k in range(num_objects):
        masks[:, k] = inst == k

    return dict(
        xyz=xyz,
        features=colors,
        colors=colors,
        segments=segments.astype(np.int32),
        masks=masks,
        labels=(inst >= 0).astype(np.int32),
        instances=inst.astype(np.int32),
        name=name or f"synth{seed:04d}",
    )


def make_batch(batch_size: int = 2, num_points: int = 20000, seed: int = 0) -> list[dict]:
    return [make_scene(num_points=num_points, seed=seed + i) for i in range(batch_size)]
