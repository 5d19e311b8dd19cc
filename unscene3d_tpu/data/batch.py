"""Device-side batch containers.

The reference moves a `NoGpu` bag of ragged tensors (datasets/utils.py:670-687)
plus per-scene target dicts to the GPU. On TPU everything is a static-shaped
pytree: scenes are concatenated into flat padded arrays (like ME's batched
SparseTensor) and per-scene decomposition happens through precomputed gather
index tables.
"""

from __future__ import annotations

from typing import Any

from flax import struct
import jax.numpy as jnp

from unscene3d_tpu.ops.sparse_graph import SparseGraph


@struct.dataclass
class Targets:
    """Instance targets, padded to T_max instances per scene.

    Mirrors the reference target dicts built by
    datasets/utils.py:480-527 (get_instance_freemasks) / :529-613.
    """

    labels: jnp.ndarray       # (B, T) int32 class ids (0 = foreground for freemask)
    valid: jnp.ndarray        # (B, T) bool
    seg_masks: jnp.ndarray    # (B, T, S) bool: per-instance segment membership
    vox_masks: jnp.ndarray    # (N0_pad, T) bool: per-instance voxel masks, rows
    #                            live only inside the owning scene's row range

    @property
    def num_instances_padded(self) -> int:
        return self.labels.shape[1]


@struct.dataclass
class SceneBatch:
    """One collated batch in flat padded layout."""

    graph: SparseGraph
    features: jnp.ndarray        # (N0, C_in) float
    raw_coords: jnp.ndarray      # (N0, 3) float, un-voxelized xyz
    point2segment: jnp.ndarray   # (N0,) int32 local segment id per voxel
    seg_valid: jnp.ndarray       # (B, S) bool segment existence
    # Per-level scene decomposition: flat indices of each scene's voxels at
    # each graph level, padded; invalid entries point at a padded flat row.
    scene_idx: tuple             # tuple of (B, n_max_l) int32, levels 0..4
    scene_valid: tuple           # tuple of (B, n_max_l) bool
    target: Targets | None = None
    triplane: Any = None         # TriplaneMaps, when the noise-robust loss is on
    level_bounds: Any = None     # (B, 5, 2, 3) f32 host-precomputed per-scene
    #                              [min, max] of the avg-pool2 coordinate
    #                              pyramid per level (pos-enc normalization;
    #                              bitwise-replicates conv_ops.avg_pool2, so
    #                              the ~7ms of XLA segment-min/max scatters
    #                              leave the device forward)
    seg_counts: Any = None       # (B*S,) f32 per-segment voxel counts
    #                              (denominator of the segment mean-pool)
    fps_idx: Any = None          # (B, Q) int32 host-precomputed FPS query
    #                              seeds over each scene's L0 voxels (same
    #                              iterative-argmax algorithm as ops/fps.py;
    #                              FPS depends only on coordinates, so doing
    #                              it in the collate worker removes a ~13ms
    #                              O(Q*N) device loop from the eval forward)

    @property
    def batch_size(self) -> int:
        return self.scene_idx[0].shape[0]

    @property
    def num_segments_padded(self) -> int:
        return self.seg_valid.shape[1]

    @property
    def batch_idx(self) -> jnp.ndarray:
        return self.graph.levels[0].coords[:, 0]

    @property
    def valid(self) -> jnp.ndarray:
        return self.graph.levels[0].valid
