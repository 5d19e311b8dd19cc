"""The scanned shared-decoder path must match the unrolled loop exactly
(identical params, eval mode so no sampling randomness)."""

import numpy as np
import jax
import jax.numpy as jnp

from unscene3d_tpu.data.collate import FreeMaskCollator
from unscene3d_tpu.data.synthetic import make_batch
from unscene3d_tpu.models.backbone import Res16UNet14A
from unscene3d_tpu.models.mask3d import Mask3D


def build(scan: bool):
    return Mask3D(
        backbone=Res16UNet14A(out_channels=2), num_classes=3, hidden_dim=32,
        num_queries=8, num_heads=2, dim_feedforward=64, num_decoders=2,
        sample_sizes=(16, 32, 64, 128, 256), scan_decoder=scan,
    )


def test_scan_equals_loop_eval():
    batch, _ = FreeMaskCollator(voxel_size=0.12)(make_batch(2, num_points=1500))
    loop_model = build(scan=False)
    scan_model = build(scan=True)
    variables = loop_model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch, train=False, is_eval=True,
    )
    # identical param trees (the scan path reuses the same submodules)
    v2 = scan_model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch, train=False, is_eval=True,
    )
    t1 = jax.tree.map(lambda x: x.shape, variables["params"])
    t2 = jax.tree.map(lambda x: x.shape, v2["params"])
    assert t1 == t2

    out_loop = loop_model.apply(variables, batch, train=False, is_eval=True)
    out_scan = scan_model.apply(variables, batch, train=False, is_eval=True)
    np.testing.assert_allclose(
        np.asarray(out_scan["pred_logits"]), np.asarray(out_loop["pred_logits"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_scan["pred_masks_seg"]),
        np.asarray(out_loop["pred_masks_seg"]), rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_scan["pred_masks_vox"][-1]),
        np.asarray(out_loop["pred_masks_vox"][-1]), rtol=2e-4, atol=2e-5,
    )


def test_scan_aux_vox_shapes():
    batch, _ = FreeMaskCollator(voxel_size=0.12)(make_batch(1, num_points=1200))
    model = build(scan=True)
    v = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                   batch, train=False, is_eval=True)
    out, _ = model.apply(v, batch, train=True, return_aux_vox=True,
                         rngs={"sample": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    L = 2 * 4 + 1
    assert out["pred_logits"].shape[0] == L
    assert out["pred_masks_vox"].shape[0] == L
    assert bool(jnp.isfinite(out["pred_logits"]).all())
