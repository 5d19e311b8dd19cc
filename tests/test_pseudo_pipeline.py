"""Pseudo-mask pipeline on synthetic scenes (geom modality, random CSC init)."""

import numpy as np
import pytest

from unscene3d_tpu.data.synthetic import make_scene
from unscene3d_tpu.ops.hashing import sparse_quantize
from unscene3d_tpu.pseudo.ncut import NCutConfig
from unscene3d_tpu.pseudo.pipeline import PseudoMaskPipeline


def synthetic_pseudo_scene(seed=0, voxel_size=0.08):
    s = make_scene(num_points=4000, num_objects=4, seed=seed)
    coords, unique_map, inverse_map = sparse_quantize(s["xyz"], voxel_size)
    seg = s["segments"][unique_map]
    # grid-cell adjacency as connectivity
    uniq = np.unique(seg)
    conn = []
    for i in range(len(uniq) - 1):
        conn.append([uniq[i], uniq[i + 1]])
        conn.append([uniq[i + 1], uniq[i]])
    return dict(
        scene_name=f"synth{seed:04d}",
        full_coords=s["xyz"],
        full_colors=s["colors"],
        coords=coords,
        feats=s["colors"][unique_map] - 0.5,
        segment_ids=[seg],
        segment_connectivity=[np.asarray(conn)],
    )


def test_pipeline_geom_modality(tmp_path):
    scenes = [synthetic_pseudo_scene(seed=i) for i in range(2)]
    pipe = PseudoMaskPipeline(
        modality="geom",
        voxel_size=0.08,
        ncut_cfg=NCutConfig(affinity_tau=0.5, min_segment_size=2,
                            max_number_of_instances=5),
    )
    results = pipe.process_scenes(scenes, save_dir=str(tmp_path))
    assert set(results) == {"synth0000", "synth0001"}
    for name, (cloud, masks) in results.items():
        assert cloud.shape == scenes[0]["full_coords"].shape
        assert masks.shape[0] == cloud.shape[0]
        assert masks.dtype == bool
    # idempotent: second call skips existing scenes
    again = pipe.process_scenes(scenes, save_dir=str(tmp_path))
    assert again == {}
