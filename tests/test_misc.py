"""Smaller parity pieces: metrics, file-based evaluate, PLY IO, pos-enc
variants, visualization export, whitening."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from unscene3d_tpu.data.ply import read_ply, write_ply
from unscene3d_tpu.eval.instance_eval import evaluate
from unscene3d_tpu.eval.metrics import ConfusionMatrix, iou_from_confusion
from unscene3d_tpu.eval.visualize import save_scene_visualization
from unscene3d_tpu.models.position_embedding import PositionEmbeddingCoordsSine
from unscene3d_tpu.pseudo.freemask_utils import l2_sim, whiten_feats


def test_confusion_and_iou():
    cm = ConfusionMatrix(num_classes=3, ignore_label=255)
    cm.add(np.array([0, 1, 2, 1]), np.array([0, 1, 1, 255]))
    conf = cm.value()
    assert conf[0, 0] == 1 and conf[1, 1] == 1 and conf[1, 2] == 1
    iou = iou_from_confusion(conf)
    assert abs(iou[1] - 0.5) < 1e-9  # tp=1, fn=1


def test_file_based_evaluate(tmp_path):
    gt = np.zeros(500, np.int64)
    gt[:200] = 1001
    gt[200:350] = 1002
    np.savetxt(tmp_path / "sceneA.txt", gt, fmt="%d")
    masks = np.stack([gt == 1001, gt == 1002], 1)
    preds = {"sceneA": {"pred_masks": masks,
                        "pred_classes": np.array([1, 1]),
                        "pred_scores": np.array([0.9, 0.8])}}
    res = evaluate(preds, str(tmp_path), str(tmp_path / "out.json"),
                   dataset="freemask")
    assert abs(res["all_ap_50%"] - 1.0) < 1e-9
    assert os.path.exists(tmp_path / "out.json")


def test_ply_roundtrip(tmp_path):
    v = np.random.RandomState(0).rand(50, 3).astype(np.float32)
    c = (np.random.RandomState(1).rand(50, 3) * 255).astype(np.uint8)
    f = np.random.RandomState(2).randint(0, 50, (30, 3)).astype(np.int32)
    path = str(tmp_path / "x.ply")
    write_ply(path, v, c, f)
    data = read_ply(path)
    np.testing.assert_allclose(data["vertices"], v, rtol=1e-6)
    assert (data["colors"] == c).all()
    assert (data["faces"] == f).all()


def test_pos_enc_variants():
    xyz = jnp.asarray(np.random.RandomState(0).rand(1, 40, 3), jnp.float32)
    mn = jnp.zeros((1, 1, 3))
    mx = jnp.ones((1, 1, 3))
    for pt in ("fourier", "sine", "legacy"):
        mod = PositionEmbeddingCoordsSine(d_pos=32, pos_type=pt)
        v = mod.init(jax.random.PRNGKey(0), xyz, mn, mx)
        out = mod.apply(v, xyz, mn, mx)
        assert out.shape == (1, 40, 32)
        assert bool(jnp.isfinite(out).all())


def test_visualization_export(tmp_path):
    coords = np.random.RandomState(0).rand(100, 3).astype(np.float32)
    masks = np.zeros((100, 2), bool)
    masks[:30, 0] = True
    masks[40:70, 1] = True
    save_scene_visualization(
        str(tmp_path), "s0", coords,
        colors=np.random.rand(100, 3).astype(np.float32),
        segments=np.random.randint(0, 5, 100),
        masks=masks,
        features=np.random.rand(100, 16).astype(np.float32),
    )
    names = sorted(os.listdir(tmp_path))
    # PLY layers + the self-contained interactive WebGL viewer (r5)
    assert names == ["s0.html", "s0_instances.ply", "s0_pca.ply",
                     "s0_rgb.ply", "s0_segments.ply"]
    html = (tmp_path / "s0.html").read_text()
    assert "<canvas" in html and "instances" in html


def test_whiten_and_l2():
    f = np.random.RandomState(0).rand(30, 8).astype(np.float32)
    w = whiten_feats(f)
    assert w.shape == f.shape and np.abs(w).max() <= 1.0 + 1e-5
    s = l2_sim(f[:5], f[:5])
    assert s.shape == (5, 5)
    assert s.min() >= 0 and s.max() <= 1 + 1e-6
