"""Matcher + criterion vs. an independent numpy implementation of the
reference formulas (models/matcher.py:12-64, models/criterion.py:22-216)."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from unscene3d_tpu.data.batch import SceneBatch, Targets
from unscene3d_tpu.losses.matcher import HungarianMatcher
from unscene3d_tpu.losses.criterion import SetCriterion

rng = np.random.RandomState(42)

L, B, Q, C, S, T = 2, 2, 5, 3, 8, 3


def sigmoid(x):
    return 1 / (1 + np.exp(-x))


def softplus(x):
    return np.logaddexp(0, x)


def make_case():
    pred_logits = rng.randn(L, B, Q, C).astype(np.float32)
    pred_masks = rng.randn(L, B, S, Q).astype(np.float32)
    n_seg = [6, 5]
    n_tgt = [3, 2]
    seg_valid = np.zeros((B, S), bool)
    for b in range(B):
        seg_valid[b, : n_seg[b]] = True
    labels = np.zeros((B, T), np.int32)
    t_valid = np.zeros((B, T), bool)
    seg_masks = np.zeros((B, T, S), bool)
    for b in range(B):
        labels[b, : n_tgt[b]] = 1
        t_valid[b, : n_tgt[b]] = True
        for t in range(n_tgt[b]):
            m = rng.rand(n_seg[b]) > 0.5
            if not m.any():
                m[0] = True
            seg_masks[b, t, : n_seg[b]] = m
    # zero out padded segment logits like the model does
    pred_masks = pred_masks * seg_valid[None, :, :, None]
    return pred_logits, pred_masks, seg_valid, labels, t_valid, seg_masks


def oracle_match(pred_logits, pred_masks, seg_valid, labels, t_valid, seg_masks,
                 cc=2.0, cm=5.0, cd=2.0):
    """Per-(l,b) cost + LSAP exactly as the reference computes it on unpadded
    tensors."""
    matches = -np.ones((L, B, T), np.int64)
    costs = []
    for l in range(L):
        for b in range(B):
            ns, nt = int(seg_valid[b].sum()), int(t_valid[b].sum())
            prob = np.exp(pred_logits[l, b]) / np.exp(pred_logits[l, b]).sum(-1, keepdims=True)
            cost_class = -prob[:, labels[b, :nt]]
            out = pred_masks[l, b, :ns].T  # (Q, ns)
            tgt = seg_masks[b, :nt, :ns].astype(np.float64)
            pos, neg = softplus(-out), softplus(out)
            cost_bce = (pos @ tgt.T + neg @ (1 - tgt).T) / ns
            sig = sigmoid(out)
            num = 2 * sig @ tgt.T
            den = sig.sum(-1)[:, None] + tgt.sum(-1)[None]
            cost_dice = 1 - (num + 1) / (den + 1)
            cmat = cm * cost_bce + cc * cost_class + cd * cost_dice
            rows, cols = linear_sum_assignment(cmat)
            matches[l, b, cols] = rows
            costs.append(cmat)
    return matches


def oracle_losses(pred_logits, pred_masks, seg_valid, labels, t_valid, seg_masks,
                  matches, eos_coef=0.1):
    ce = np.zeros(L)
    lm = np.zeros(L)
    ld = np.zeros(L)
    w_class = np.ones(C)
    w_class[-1] = eos_coef
    for l in range(L):
        # CE over all queries of all scenes with weighted mean
        tc = np.full((B, Q), C - 1)
        for b in range(B):
            for t in range(int(t_valid[b].sum())):
                tc[b, matches[l, b, t]] = labels[b, t]
        logp = pred_logits[l] - np.log(
            np.exp(pred_logits[l]).sum(-1, keepdims=True)
        )
        nll = -np.take_along_axis(logp, tc[..., None], -1)[..., 0]
        w = w_class[tc]
        ce[l] = (nll * w).sum() / w.sum()
        for b in range(B):
            ns, nt = int(seg_valid[b].sum()), int(t_valid[b].sum())
            mp = pred_masks[l, b, :ns][:, matches[l, b, :nt]].T  # (nt, ns)
            tgt = seg_masks[b, :nt, :ns].astype(np.float64)
            bce = softplus(-mp) * tgt + softplus(mp) * (1 - tgt)
            lm[l] += bce.mean(1).sum() / nt
            sig = sigmoid(mp)
            dice = 1 - (2 * (sig * tgt).sum(1) + 1) / (sig.sum(1) + tgt.sum(1) + 1)
            ld[l] += dice.sum() / nt
    return ce, lm, ld


def test_matcher_and_criterion_match_oracle():
    pred_logits, pred_masks, seg_valid, labels, t_valid, seg_masks = make_case()
    matcher = HungarianMatcher(solver="scipy")  # exactness check vs the oracle
    targets = Targets(
        labels=jnp.array(labels),
        valid=jnp.array(t_valid),
        seg_masks=jnp.array(seg_masks),
        vox_masks=jnp.zeros((4, T), bool),
    )
    matched = np.array(
        matcher(jnp.array(pred_logits), jnp.array(pred_masks), targets,
                "segment_mask", jnp.array(seg_valid))
    )
    oracle = oracle_match(pred_logits, pred_masks, seg_valid, labels, t_valid, seg_masks)
    om = np.where(t_valid[None], oracle, -1)
    assert (matched == om).all(), f"{matched} vs {om}"

    crit = SetCriterion(matcher=matcher, num_classes=C)
    # minimal SceneBatch stub: criterion only touches seg_valid/target/batch fields
    class _G:  # noqa
        pass

    import types
    batch = types.SimpleNamespace(
        target=targets,
        seg_valid=jnp.array(seg_valid),
        batch_size=B,
        batch_idx=jnp.zeros(4, jnp.int32),
        valid=jnp.ones(4, bool),
    )
    outputs = {
        "pred_logits": jnp.array(pred_logits),
        "pred_masks_seg": jnp.array(pred_masks),
        "pred_masks_vox": jnp.zeros((1, 4, Q)),
    }
    losses = crit(outputs, batch)
    ce, lm, ld = oracle_losses(
        pred_logits, pred_masks, seg_valid, labels, t_valid, seg_masks, oracle
    )
    np.testing.assert_allclose(np.array(losses["loss_ce"]), ce, rtol=1e-5)
    np.testing.assert_allclose(np.array(losses["loss_mask"]), lm, rtol=1e-5)
    np.testing.assert_allclose(np.array(losses["loss_dice"]), ld, rtol=1e-5)
    expected_total = (2.0 * ce + 5.0 * lm + 2.0 * ld).sum()
    np.testing.assert_allclose(np.array(losses["total"]), expected_total, rtol=1e-5)


def test_droploss_zeroes_bad_matches():
    pred_logits, pred_masks, seg_valid, labels, t_valid, seg_masks = make_case()
    matcher = HungarianMatcher()
    targets = Targets(
        labels=jnp.array(labels), valid=jnp.array(t_valid),
        seg_masks=jnp.array(seg_masks), vox_masks=jnp.zeros((4, T), bool),
    )
    import types
    batch = types.SimpleNamespace(
        target=targets, seg_valid=jnp.array(seg_valid), batch_size=B,
        batch_idx=jnp.zeros(4, jnp.int32), valid=jnp.ones(4, bool),
    )
    outputs = {
        "pred_logits": jnp.array(pred_logits),
        "pred_masks_seg": jnp.array(pred_masks),
        "pred_masks_vox": jnp.zeros((1, 4, Q)),
    }
    base = SetCriterion(matcher=matcher, num_classes=C)(outputs, batch)
    drop = SetCriterion(matcher=matcher, num_classes=C, use_droploss=True,
                        droploss_iou_thresh=0.45)(outputs, batch)
    # with a high threshold, most random matches are dropped -> smaller loss
    assert float(drop["loss_mask"].sum()) <= float(base["loss_mask"].sum()) + 1e-6
    assert float(drop["loss_dice"].sum()) <= float(base["loss_dice"].sum()) + 1e-6


def test_auction_matcher_close_to_scipy():
    """The default on-device auction solver yields (near-)optimal matchings;
    on this tiny case both solvers must produce valid distinct assignments
    with total cost within 5%."""
    pred_logits, pred_masks, seg_valid, labels, t_valid, seg_masks = make_case()
    targets = Targets(
        labels=jnp.array(labels), valid=jnp.array(t_valid),
        seg_masks=jnp.array(seg_masks), vox_masks=jnp.zeros((4, T), bool),
    )
    args = (jnp.array(pred_logits), jnp.array(pred_masks), targets,
            "segment_mask", jnp.array(seg_valid))
    m_auction = np.array(HungarianMatcher()(*args))
    m_scipy = np.array(HungarianMatcher(solver="scipy")(*args))
    for l in range(L):
        for b in range(B):
            nt = int(t_valid[b].sum())
            a, s = m_auction[l, b, :nt], m_scipy[l, b, :nt]
            assert len(set(a.tolist())) == nt
            assert (a >= 0).all()
