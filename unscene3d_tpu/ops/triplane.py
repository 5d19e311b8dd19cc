"""Tri-plane projection loss ops: deterministic XLA segment-sums.

Replaces the reference's custom_cuda_utils.project_sparse_voxels_to_planes
atomicAdd kernels + hand-written backward (utils/cuda_utils/cuda_utils_kernel.cu
:371-559, models/noise_robust_loss.py:16-102): per-instance sigmoid predictions
and targets are accumulated onto the XY/XZ/YZ planes, normalized by per-pixel
voxel counts, and compared with BCE over occupied pixels. Here the planes are
*compact*: the host enumerates only occupied pixels (their set depends on
coords alone), so the device does three `segment_sum`s into a padded 1-D pixel
space and autodiff provides exactly the reference's backward (plane grads
spread to voxels / counts).

Delta vs reference: the CUDA path allocates planes of size max(coord)
(exclusive) and silently drops boundary voxels; we keep all voxels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from unscene3d_tpu.ops.segment_ops import segment_count, segment_sum
from unscene3d_tpu.ops.sparse_graph import bucket_size

_PLANE_AXES = ((1, 2), (1, 3), (2, 3))  # xy, xz, yz over [b,x,y,z] columns


@struct.dataclass
class TriplaneMaps:
    pixel_id: jnp.ndarray       # (3, N0) int32 compact pixel id per plane
    pix_scene: jnp.ndarray      # (n_pix,) int32 owning scene
    pix_valid: jnp.ndarray      # (n_pix,) bool


def build_triplane_maps(coords: np.ndarray, valid: np.ndarray,
                        num_scenes: int, n_pix_pad: int | None = None) -> TriplaneMaps:
    """coords: (N0_pad, 4) int voxel coords, valid: (N0_pad,) bool. Host-side."""
    coords = np.asarray(coords, np.int64)
    n0 = len(coords)
    ids = np.zeros((3, n0), np.int64)
    scenes_list = []
    offset = 0
    for d, (a, b) in enumerate(_PLANE_AXES):
        key = (
            coords[:, 0] * (1 << 42)
            + (coords[:, a] + (1 << 19)) * (1 << 21)
            + (coords[:, b] + (1 << 19))
        )
        key = np.where(valid, key, -1)
        uniq, inv = np.unique(key, return_inverse=True)
        has_pad = uniq[0] == -1 if len(uniq) else False
        # drop the padding bucket; real pixels get offset-consecutive ids
        local = inv - int(has_pad)
        ids[d] = np.where(valid, local + offset, 0)
        n_real = len(uniq) - int(has_pad)
        pix_coords = uniq[int(has_pad):]
        scenes_list.append((pix_coords >> 42).astype(np.int32))
        offset += n_real
    n_pix = offset
    if n_pix_pad is None:
        n_pix_pad = bucket_size(n_pix + 1)
    assert n_pix_pad > n_pix
    pix_scene = np.zeros(n_pix_pad, np.int32)
    pix_scene[:n_pix] = np.concatenate(scenes_list) if n_pix else []
    pix_valid = np.zeros(n_pix_pad, bool)
    pix_valid[:n_pix] = True
    return TriplaneMaps(
        pixel_id=jnp.asarray(ids, jnp.int32),
        pix_scene=jnp.asarray(pix_scene),
        pix_valid=jnp.asarray(pix_valid),
    )


def triplane_projection_loss(
    pred_sigmoid: jnp.ndarray,   # (N0, T) in [0,1]
    target: jnp.ndarray,         # (N0, T) float {0,1}
    tri: TriplaneMaps,
    vox_valid: jnp.ndarray,      # (N0,)
    t_valid: jnp.ndarray,        # (B, T)
    num_scenes: int,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """Reference semantics (models/noise_robust_loss.py:126-163): per scene,
    sum of BCE between count-normalized pred/target projections over occupied
    pixels and valid instances, divided by (num_instances * num_occupied_pixels);
    summed over scenes."""
    n_pix = tri.pix_scene.shape[0]
    proj_p = jnp.zeros((n_pix, pred_sigmoid.shape[1]), jnp.float32)
    proj_t = jnp.zeros_like(proj_p)
    cnt = jnp.zeros((n_pix,), jnp.float32)
    for d in range(3):
        proj_p = proj_p + segment_sum(pred_sigmoid.astype(jnp.float32), tri.pixel_id[d], n_pix, vox_valid)
        proj_t = proj_t + segment_sum(target.astype(jnp.float32), tri.pixel_id[d], n_pix, vox_valid)
        cnt = cnt + segment_count(tri.pixel_id[d], n_pix, vox_valid)
    denom = cnt[:, None] + eps
    p = jnp.clip(proj_p / denom, 1e-7, 1.0 - 1e-7)
    t = jax.lax.stop_gradient(proj_t / denom)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    occupied = (cnt > 0) & tri.pix_valid
    tv = jnp.take(t_valid.astype(jnp.float32), tri.pix_scene, axis=0)  # (n_pix, T)
    bce = bce * tv * occupied[:, None]

    npix_scene = segment_sum(occupied.astype(jnp.float32), tri.pix_scene, num_scenes, tri.pix_valid)
    n_inst = t_valid.sum(-1).astype(jnp.float32)
    all_shape = jnp.maximum(n_inst * npix_scene, 1.0)
    loss_scene = segment_sum(bce.sum(-1), tri.pix_scene, num_scenes, tri.pix_valid)
    return (loss_scene / all_shape).sum()
