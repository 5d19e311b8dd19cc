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


def test_interpolate_render_matches_numpy_oracle():
    """Trilinear render variant (raycast_cuda_kernel.cu:197-359): numpy
    oracle replicating the corner-weight math at the same first-hit."""
    import numpy as np
    import jax.numpy as jnp

    from unscene3d_tpu.pseudo.projection import (
        render_voxels_to_image_interpolate)

    rng = np.random.RandomState(0)
    D = 12
    # occupied voxel slab at z=5..6 plus sparse extras
    coords = []
    for x in range(2, 10):
        for y in range(2, 10):
            coords.append([x, y, 5])
            if (x + y) % 3 == 0:
                coords.append([x, y, 6])
    coords = np.asarray(coords, np.int32)
    n = len(coords)
    feats = rng.rand(n, 4).astype(np.float32)
    H = W = 16
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [6.0, 6.0, 0.0]   # camera above slab looking +z (world units)

    img, wimg, mapping = render_voxels_to_image_interpolate(
        jnp.asarray(feats), jnp.asarray(coords), jnp.ones(n, bool),
        jnp.asarray(pose), jnp.asarray(K), H, W, (D, D, D), voxel_size=1.0)
    img = np.asarray(img)

    # numpy oracle
    occ = -np.ones((D, D, D), np.int64)
    for i, (x, y, z) in enumerate(coords):
        occ[x, y, z] = i
    centers = coords + 0.5
    cam = centers - pose[:3, 3]
    z = cam[:, 2]
    u = np.round(K[0, 0] * cam[:, 0] / z + K[0, 2]).astype(int)
    v = np.round(K[1, 1] * cam[:, 1] / z + K[1, 2]).astype(int)
    want = np.zeros((H, W, 4), np.float32)
    vmax = np.sqrt(3.0)
    for py in range(H):
        for px in range(W):
            sel = (u == px) & (v == py) & (z > 0.05)
            if not sel.any():
                continue
            zwin = z[sel].min()
            ray = np.array([(px - K[0, 2]) / K[0, 0],
                            (py - K[1, 2]) / K[1, 1], 1.0])
            pos = pose[:3, 3] + ray * zwin
            base = np.floor(pos).astype(int)
            wsum, acc = 1e-4, np.zeros(4)
            for off in ((0,0,0),(1,0,0),(0,1,0),(0,0,1),
                        (1,1,0),(0,1,1),(1,0,1),(1,1,1)):
                c = base + off
                if (c < 0).any() or (c >= D).any():
                    continue
                idx = occ[tuple(c)]
                if idx < 0:
                    continue
                w = max(vmax - np.linalg.norm(pos - c), 0.0) / vmax
                wsum += w
                acc = acc + w * feats[idx]
            want[py, px] = acc / wsum
    np.testing.assert_allclose(img, want, atol=1e-5)


def test_interpolate_render_gradients_scatter():
    """Backward scatters grad*weight to voxels
    (raycast_interpolate_cuda_backward_kernel, :496-559)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unscene3d_tpu.pseudo.projection import (
        render_voxels_to_image_interpolate)

    coords = np.asarray([[4, 4, 4], [5, 4, 4], [4, 5, 4]], np.int32)
    feats = jnp.asarray(np.random.RandomState(1).rand(3, 2), jnp.float32)
    H = W = 8
    K = jnp.asarray([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]])
    pose = jnp.eye(4).at[:3, 3].set(jnp.asarray([4.5, 4.5, 0.0]))

    def loss(f):
        img, _, _ = render_voxels_to_image_interpolate(
            f, jnp.asarray(coords), jnp.ones(3, bool), pose, K, H, W,
            (10, 10, 10))
        return img.sum()

    g = jax.grad(loss)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
