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


@functools.partial(jax.jit, static_argnames=("height", "width", "grid_dims"))
def render_voxels_to_image_interpolate(
    voxel_feats: jnp.ndarray,   # (N, C)
    vox_coords: jnp.ndarray,    # (N, 3) int grid coords (floor(world/voxel))
    valid: jnp.ndarray,         # (N,) bool
    pose: jnp.ndarray,          # (4, 4) camera-to-world, world units
    K: jnp.ndarray,             # (3, 3)
    height: int,
    width: int,
    grid_dims: tuple,           # (Dx, Dy, Dz) occupancy grid extents
    voxel_size: float = 1.0,
    min_depth: float = 0.05,
):
    """Trilinear-interpolation render variant
    (raycast_cuda_kernel.cu:197-359,431-541 + backward :496-559).

    Per pixel: find the first-hit voxel (z-buffer splat instead of a marching
    loop -- same first-visible-cell semantics), take the continuous ray
    position at that depth in GRID coordinates, and blend the 8
    positive-corner neighbor voxels (floor(pos) + {0,1}^3) with weights
    max(sqrt(3) - dist(pos, corner), 0)/sqrt(3), normalized with the
    reference's 1e-4 epsilon floor; unoccupied neighbors contribute zero.
    The backward (via JAX AD of the gather) scatters grad*weight to voxels --
    exactly the reference's raycast_interpolate_cuda_backward_kernel.

    Returns (image (H, W, C), weight_img (H, W), mapping3dto2d_num (N,)).
    """
    Dx, Dy, Dz = grid_dims
    coords = jnp.asarray(vox_coords, jnp.int32)
    n = coords.shape[0]

    # dense occupancy-index grid: cell -> voxel row + 1 (0 = empty), like
    # the reference's occ3d built from sparse coords
    flat = (coords[:, 2] * (Dy * Dx) + coords[:, 1] * Dx + coords[:, 0])
    in_grid = ((coords[:, 0] >= 0) & (coords[:, 0] < Dx) &
               (coords[:, 1] >= 0) & (coords[:, 1] < Dy) &
               (coords[:, 2] >= 0) & (coords[:, 2] < Dz) & valid)
    flat = jnp.where(in_grid, flat, Dz * Dy * Dx)  # park invalid in a sentinel
    occ = jnp.zeros(Dz * Dy * Dx + 1, jnp.int32).at[flat].set(
        jnp.arange(n, dtype=jnp.int32) + 1, mode="drop")

    # first-hit depth per pixel via center splat (world units)
    centers_world = (coords.astype(jnp.float32) + 0.5) * voxel_size
    cam = _world_to_cam(pose, centers_world)
    u, v, z = _project_pinhole(K, cam)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height) & \
          (z > min_depth) & valid
    pix = jnp.clip(vi, 0, height - 1) * width + jnp.clip(ui, 0, width - 1)
    zbuf = -segment_max(-z, pix, height * width, inb)          # (H*W,)
    hit = segment_sum(inb.astype(jnp.float32), pix, height * width, inb) > 0

    # continuous ray position at the winning depth, in grid coordinates
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    cam_dir = jnp.stack([(xs.ravel() - K[0, 2]) / K[0, 0],
                         (ys.ravel() - K[1, 2]) / K[1, 1],
                         jnp.ones(height * width)], axis=1)    # z=1 rays
    zsafe = jnp.where(hit, zbuf, 1.0)
    pos_world = pose[:3, 3] + (cam_dir * zsafe[:, None]) @ pose[:3, :3].T
    pos_grid = pos_world / voxel_size

    base = jnp.floor(pos_grid).astype(jnp.int32)               # (P, 3)
    offsets = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                           [1, 1, 0], [0, 1, 1], [1, 0, 1], [1, 1, 1]],
                          jnp.int32)                            # kernel order
    corners = base[:, None, :] + offsets[None]                  # (P, 8, 3)
    corner_ok = ((corners[..., 0] >= 0) & (corners[..., 0] < Dx) &
                 (corners[..., 1] >= 0) & (corners[..., 1] < Dy) &
                 (corners[..., 2] >= 0) & (corners[..., 2] < Dz) &
                 hit[:, None])
    cflat = (corners[..., 2] * (Dy * Dx) + corners[..., 1] * Dx +
             corners[..., 0])
    cflat = jnp.where(corner_ok, cflat, Dz * Dy * Dx)
    vox_id = occ[cflat] - 1                                     # (P, 8), -1 empty
    occupied = vox_id >= 0

    # reference weight: max(sqrt(3) - |pos - corner_int|, 0) / sqrt(3)
    dist = jnp.linalg.norm(pos_grid[:, None, :] - corners.astype(jnp.float32),
                           axis=-1)
    vmax = jnp.sqrt(3.0)
    w = jnp.maximum(vmax - dist, 0.0) / vmax
    w = jnp.where(occupied, w, 0.0)
    wsum = 1e-4 + w.sum(-1)                                     # eps floor
    w = w / wsum[:, None]

    feats = jnp.take(voxel_feats, jnp.clip(vox_id, 0, n - 1), axis=0)
    feats = jnp.where(occupied[..., None], feats, 0.0)
    img = (feats * w[..., None]).sum(1)                         # (P, C)

    # per-voxel association weights (mapping3dto2d_num, pre-normalization)
    raw_w = jnp.where(occupied, jnp.maximum(vmax - dist, 0.0) / vmax, 0.0)
    mapping = segment_sum(raw_w.reshape(-1), jnp.clip(vox_id, 0, n - 1).reshape(-1),
                          n, occupied.reshape(-1))

    return (img.reshape(height, width, -1),
            w.sum(-1).reshape(height, width), mapping)
