"""2D->3D z-buffer projection + 3D->2D render tests with a hand-built camera."""

import numpy as np
import jax.numpy as jnp

from unscene3d_tpu.pseudo.projection import project_2d_features, render_voxels_to_image

H, W = 32, 32
K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
IDENTITY_POSE = np.eye(4, dtype=np.float32)  # camera at origin looking +z


def two_wall_scene():
    """Two parallel walls at z=2 and z=4. The near wall is sampled densely
    enough to cover every pixel of the far wall's (smaller) footprint, so the
    far wall is fully occluded -- matching what the reference's ray-march
    would see with a gap-free near surface."""
    xs, ys = np.meshgrid(np.linspace(-0.5, 0.5, 64), np.linspace(-0.5, 0.5, 64))
    near = np.column_stack([xs.ravel(), ys.ravel(), np.full(xs.size, 2.0)])
    xf, yf = np.meshgrid(np.linspace(-0.4, 0.4, 9), np.linspace(-0.4, 0.4, 9))
    far = np.column_stack([xf.ravel(), yf.ravel(), np.full(xf.size, 4.0)])
    pts = np.vstack([near, far]).astype(np.float32)
    return pts, len(near)


def test_occlusion_first_hit():
    pts, n_near = two_wall_scene()
    feats = np.zeros((1, H, W, 2), np.float32)
    feats[..., 0] = 1.0  # constant channel
    out, cnt = project_2d_features(
        jnp.asarray(feats), jnp.asarray(pts), jnp.ones(len(pts), bool),
        jnp.asarray(IDENTITY_POSE)[None], jnp.asarray(K), H, W,
        depth_tolerance=0.1,
    )
    cnt = np.asarray(cnt)
    # all near-wall voxels hit; far wall fully occluded (same pixels)
    assert (cnt[:n_near] == 1).all()
    assert (cnt[n_near:] == 0).all()
    assert np.allclose(np.asarray(out)[:n_near, 0], 1.0)


def test_pixel_feature_lookup():
    pts = np.array([[0.0, 0.0, 3.0]], np.float32)  # projects to image center
    feats = np.zeros((1, H, W, 1), np.float32)
    feats[0, H // 2, W // 2, 0] = 7.0
    out, cnt = project_2d_features(
        jnp.asarray(feats), jnp.asarray(pts), jnp.ones(1, bool),
        jnp.asarray(IDENTITY_POSE)[None], jnp.asarray(K), H, W,
    )
    assert int(cnt[0]) == 1
    assert abs(float(out[0, 0]) - 7.0) < 1e-6


def test_behind_camera_and_out_of_bounds():
    pts = np.array([[0, 0, -2.0], [50.0, 0, 3.0]], np.float32)
    feats = np.ones((1, H, W, 1), np.float32)
    _, cnt = project_2d_features(
        jnp.asarray(feats), jnp.asarray(pts), jnp.ones(2, bool),
        jnp.asarray(IDENTITY_POSE)[None], jnp.asarray(K), H, W,
    )
    assert (np.asarray(cnt) == 0).all()


def test_render_nearest_voxel():
    pts, n_near = two_wall_scene()
    vf = np.zeros((len(pts), 1), np.float32)
    vf[:n_near] = 1.0
    vf[n_near:] = 5.0
    img, hit = render_voxels_to_image(
        jnp.asarray(vf), jnp.asarray(pts), jnp.ones(len(pts), bool),
        jnp.asarray(IDENTITY_POSE), jnp.asarray(K), H, W,
    )
    img, hit = np.asarray(img), np.asarray(hit)
    assert hit.any()
    # every hit pixel shows the NEAR wall's feature
    assert np.allclose(img[hit][:, 0], 1.0)
