"""2D->3D feature projection and 3D->2D rendering, TPU-native.

Replaces the reference's CUDA ray-marchers:
  * project_features_cuda (utils/cuda_utils/project_image_cuda_kernel.cu:24-66,
    wrapper Project2DFeaturesCUDA at utils/cuda_utils/raycast_image.py:18-77):
    for every pixel, the first occupied voxel along the camera ray receives
    the pixel's feature. Here: a z-buffer splat -- every voxel projects to a
    pixel; per pixel the minimum camera depth wins; voxels within a small
    depth tolerance of the winner receive that pixel's feature. First-hit
    visibility semantics without a marching loop, fully batched, and the
    atomicAdd accumulation becomes a deterministic masked sum.
  * raycast_cuda nearest-indexer render (raycast_cuda_kernel.cu:84-160):
    render_voxels_to_image renders per-pixel features of the nearest voxel,
    differentiable through gather/segment ops (autodiff supplies the
    scatter-normalized backward the reference hand-writes at :162-230).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from unscene3d_tpu.ops.segment_ops import segment_max, segment_sum


def _world_to_cam(c2w: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """c2w: (4,4) camera-to-world pose; pts (N,3) -> camera frame."""
    r = c2w[:3, :3]
    t = c2w[:3, 3]
    return (pts - t) @ r  # R^T (p - t)


def _project_pinhole(K: jnp.ndarray, cam: jnp.ndarray):
    z = cam[:, 2]
    u = K[0, 0] * cam[:, 0] / jnp.where(z == 0, 1e-9, z) + K[0, 2]
    v = K[1, 1] * cam[:, 1] / jnp.where(z == 0, 1e-9, z) + K[1, 2]
    return u, v, z


@functools.partial(jax.jit, static_argnames=("height", "width", "reference_average"))
def project_2d_features(
    features: jnp.ndarray,      # (V, H, W, C)
    world_pts: jnp.ndarray,     # (N, 3) voxel centers in world frame
    valid: jnp.ndarray,         # (N,)
    poses: jnp.ndarray,         # (V, 4, 4) camera-to-world
    intrinsics: jnp.ndarray,    # (3, 3) or (V, 3, 3)
    height: int,
    width: int,
    depth_tolerance: float = 0.05,
    min_depth: float = 0.05,
    reference_average: bool = False,
):
    """Returns (voxel_feats (N, C), hit_counts (N,)).

    reference_average=True replicates the reference's per-view pairwise mean
    (unscene3d_pseudo_main.py:312-313: new = (old + projected)/2 on hit
    voxels); default accumulates a true mean over views.
    """
    V = features.shape[0]
    C = features.shape[-1]
    N = world_pts.shape[0]
    Ks = jnp.broadcast_to(intrinsics, (V, 3, 3)) if intrinsics.ndim == 2 else intrinsics

    def body(carry, inp):
        acc, cnt = carry
        feat_v, pose_v, K_v = inp
        cam = _world_to_cam(pose_v, world_pts)
        u, v, z = _project_pinhole(K_v, cam)
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inb = (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height) & \
              (z > min_depth) & valid
        pix = jnp.clip(vi, 0, height - 1) * width + jnp.clip(ui, 0, width - 1)
        # z-buffer: min depth per pixel over candidate voxels
        neg_zbuf = segment_max(-z, pix, height * width, inb)
        zbuf = -neg_zbuf
        hit = inb & (z <= zbuf[pix] + depth_tolerance)
        f = jnp.take(feat_v.reshape(height * width, C), pix, axis=0)
        f = f * hit[:, None].astype(f.dtype)
        if reference_average:
            acc = jnp.where(hit[:, None], (acc + f) / 2.0, acc)
        else:
            acc = acc + f
        cnt = cnt + hit.astype(jnp.int32)
        return (acc, cnt), None

    acc0 = jnp.zeros((N, C), jnp.float32)
    cnt0 = jnp.zeros((N,), jnp.int32)
    (acc, cnt), _ = jax.lax.scan(body, (acc0, cnt0), (features, poses, Ks))
    if not reference_average:
        acc = acc / jnp.maximum(cnt, 1)[:, None].astype(jnp.float32)
    return acc, cnt


@functools.partial(jax.jit, static_argnames=("height", "width"))
def render_voxels_to_image(
    voxel_feats: jnp.ndarray,   # (N, C)
    world_pts: jnp.ndarray,     # (N, 3)
    valid: jnp.ndarray,         # (N,)
    pose: jnp.ndarray,          # (4, 4) camera-to-world
    K: jnp.ndarray,             # (3, 3)
    height: int,
    width: int,
    min_depth: float = 0.05,
):
    """Nearest-voxel differentiable render (raycast_cuda indexer variant).
    Returns (image (H, W, C), hit_mask (H, W))."""
    cam = _world_to_cam(pose, world_pts)
    u, v, z = _project_pinhole(K, cam)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height) & \
          (z > min_depth) & valid
    pix = jnp.clip(vi, 0, height - 1) * width + jnp.clip(ui, 0, width - 1)
    neg_zbuf = segment_max(-z, pix, height * width, inb)
    zbuf = -neg_zbuf
    # winner voxels: average those at the min depth (deterministic tie-break)
    win = inb & (z <= zbuf[pix] + 1e-6)
    num = segment_sum(voxel_feats * win[:, None].astype(voxel_feats.dtype),
                      pix, height * width, win)
    den = segment_sum(win.astype(jnp.float32), pix, height * width, win)
    img = num / jnp.maximum(den, 1.0)[:, None]
    hit = (den > 0).reshape(height, width)
    return img.reshape(height, width, -1), hit
