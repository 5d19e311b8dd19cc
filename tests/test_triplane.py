"""Tri-plane projection loss: numpy oracle + gradient flow in a train step."""

import numpy as np
import jax
import jax.numpy as jnp

from unscene3d_tpu.data.collate import FreeMaskCollator
from unscene3d_tpu.data.synthetic import make_batch
from unscene3d_tpu.ops.triplane import build_triplane_maps, triplane_projection_loss


def test_triplane_matches_numpy_oracle():
    r = np.random.RandomState(0)
    n, t, b = 60, 3, 2
    coords = np.column_stack([
        r.randint(0, b, n), r.randint(0, 6, (n, 3))
    ]).astype(np.int64)
    coords = np.unique(coords, axis=0)
    n = len(coords)
    n_pad = n + 4
    coords_p = np.zeros((n_pad, 4), np.int64)
    coords_p[:n] = coords
    valid = np.zeros(n_pad, bool)
    valid[:n] = True

    pred = r.rand(n_pad, t).astype(np.float32).clip(0.05, 0.95)
    tgt = (r.rand(n_pad, t) > 0.5).astype(np.float32)
    pred[~valid] = 0
    tgt[~valid] = 0
    t_valid = np.ones((b, t), bool)

    tri = build_triplane_maps(coords_p, valid, b)
    loss = float(triplane_projection_loss(
        jnp.asarray(pred), jnp.asarray(tgt), tri, jnp.asarray(valid),
        jnp.asarray(t_valid), b,
    ))

    # numpy oracle: dense per-scene plane projections
    expected = 0.0
    planes = ((1, 2), (1, 3), (2, 3))
    for sb in range(b):
        rows = np.nonzero(valid & (coords_p[:, 0] == sb))[0]
        scene_loss, npix = 0.0, 0
        for a, c in planes:
            keys = {}
            for i in rows:
                keys.setdefault((coords_p[i, a], coords_p[i, c]), []).append(i)
            npix += len(keys)
            for members in keys.values():
                p = np.clip(pred[members].mean(0), 1e-7, 1 - 1e-7)
                q = tgt[members].mean(0)
                scene_loss += float((-(q * np.log(p) + (1 - q) * np.log(1 - p))).sum())
        expected += scene_loss / (t * npix)
    np.testing.assert_allclose(loss, expected, rtol=1e-4)


def test_triplane_gradients_flow():
    scenes = make_batch(1, num_points=1200, seed=0)
    batch, _ = FreeMaskCollator(voxel_size=0.15, build_triplane=True)(scenes)
    assert batch.triplane is not None
    n0 = batch.graph.levels[0].num_padded
    t = batch.target.labels.shape[1]

    def loss_fn(logits):
        return triplane_projection_loss(
            jax.nn.sigmoid(logits),
            batch.target.vox_masks.astype(jnp.float32),
            batch.triplane, batch.valid, batch.target.valid,
            batch.batch_size,
        )

    logits = jnp.zeros((n0, t))
    g = jax.grad(loss_fn)(logits)
    assert bool(jnp.isfinite(g).all())
    # gradient support only on valid voxels with valid targets
    assert float(jnp.abs(g).sum()) > 0
    assert float(jnp.abs(g * (~batch.valid)[:, None]).sum()) == 0.0
