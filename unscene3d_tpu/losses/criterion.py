"""DETR-style set criterion (reference models/criterion.py:93-292), vectorized
over all L prediction sets (12 aux + final) at once.

Faithful to the reference's actual computed behavior:
  * CE label loss with class weights (eos_coef on the no-object class) and the
    torch weighted-mean normalization (:138-154)
  * per-scene mask BCE / dice normalized by that scene's matched-instance
    count (the reference shadows the all-reduced num_masks at :190 -- the
    per-scene count is what's really used)
  * DropLoss: matches with intersection-over-sum < threshold get zero weight
    (:194-200; note the reference's "IoU" is |A∩B| / (|A|+|B|))
  * noise-robust tri-plane projection loss per prediction set (:170-179) via
    deterministic segment-sums (ops/triplane.py)
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct

from unscene3d_tpu.data.batch import SceneBatch, Targets
from unscene3d_tpu.losses.matcher import HungarianMatcher
from unscene3d_tpu.ops.triplane import TriplaneMaps, triplane_projection_loss


@struct.dataclass
class SetCriterion:
    matcher: HungarianMatcher
    num_classes: int = 3            # model head classes incl. no-object
    eos_coef: float = 0.1
    weight_ce: float = 2.0
    weight_mask: float = 5.0
    weight_dice: float = 2.0
    weight_noise_robust: float = 0.0
    use_droploss: bool = False
    droploss_iou_thresh: float = 0.1
    ignore_label: int = 253
    # aux prediction-set indices whose losses get zero weight (reference
    # trainer/trainer.py:73-79 general.ignore_mask_idx)
    ignore_mask_idx: tuple = struct.field(pytree_node=False, default=())

    def __call__(
        self,
        outputs: dict,
        batch: SceneBatch,
        mask_type: str = "segment_mask",
        triplane: TriplaneMaps | None = None,
    ) -> dict:
        targets = batch.target
        pred_logits = outputs["pred_logits"]          # (L, B, Q, C)
        pred_masks = outputs["pred_masks_seg"]        # (L, B, S, Q)
        L, B, Q, C = pred_logits.shape
        T = targets.labels.shape[1]

        matched_q = self.matcher(
            pred_logits, pred_masks, targets, mask_type, batch.seg_valid
        )  # (L, B, T), -1 for padding

        losses = {}
        losses["loss_ce"] = self._loss_labels(pred_logits, targets, matched_q)
        mask_losses = self._loss_masks(pred_masks, targets, matched_q, batch)
        losses.update(mask_losses)

        if self.weight_noise_robust != 0.0 and triplane is not None:
            losses["loss_noise_robust"] = self._loss_noise_robust(
                outputs["pred_masks_vox"], targets, matched_q, batch, triplane
            )
        else:
            losses["loss_noise_robust"] = jnp.zeros(L, jnp.float32)

        per_set = (
            self.weight_ce * losses["loss_ce"]
            + self.weight_mask * losses["loss_mask"]
            + self.weight_dice * losses["loss_dice"]
            + self.weight_noise_robust * losses["loss_noise_robust"]
        )
        if self.ignore_mask_idx:
            keep = jnp.ones((L,), jnp.float32)
            for i in self.ignore_mask_idx:
                keep = keep.at[i].set(0.0)
            per_set = per_set * keep
        total = per_set.sum()
        losses["total"] = total
        losses["num_masks"] = targets.valid.sum().astype(jnp.float32)
        return losses

    # ------------------------------------------------------------------ labels
    def _loss_labels(self, pred_logits, targets: Targets, matched_q):
        L, B, Q, C = pred_logits.shape
        no_object = C - 1
        empty_weight = jnp.ones((C,), jnp.float32).at[-1].set(self.eos_coef)

        # scatter matched target labels onto queries
        t_valid = targets.valid & (matched_q >= 0)
        flat_lb = (
            jnp.arange(L)[:, None, None] * B + jnp.arange(B)[None, :, None]
        )  # (L, B, 1)
        flat_idx = flat_lb * Q + jnp.clip(matched_q, 0)
        labels_b = jnp.broadcast_to(targets.labels[None], matched_q.shape)
        upd = jnp.where(t_valid, labels_b, no_object)
        # padding targets scatter into a trash slot so they never clobber a
        # real query's class
        trash = L * B * Q
        target_classes = jnp.full((L * B * Q + 1,), no_object, jnp.int32)
        sidx = jnp.where(t_valid, flat_idx, trash).reshape(-1)
        target_classes = target_classes.at[sidx].set(upd.reshape(-1))[:-1]
        target_classes = target_classes.reshape(L, B, Q)

        logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
        w = empty_weight[target_classes]
        keep = (target_classes != self.ignore_label).astype(jnp.float32)
        w = w * keep
        # torch F.cross_entropy(weight=...) normalizes by the summed weights
        return (nll * w).reshape(L, -1).sum(-1) / jnp.maximum(
            w.reshape(L, -1).sum(-1), 1e-8
        )

    # ------------------------------------------------------------------- masks
    def _loss_masks(self, pred_masks, targets: Targets, matched_q, batch: SceneBatch):
        L, B, S, Q = pred_masks.shape
        T = targets.labels.shape[1]
        seg_valid = batch.seg_valid.astype(jnp.float32)          # (B, S)
        t_valid = (targets.valid & (matched_q >= 0)).astype(jnp.float32)  # (L,B,T)

        # matched prediction logits per target: (L, B, T, S)
        pm = jnp.swapaxes(pred_masks, 2, 3)                      # (L, B, Q, S)
        mq = jnp.clip(matched_q, 0)
        x = jnp.take_along_axis(pm, mq[..., None], axis=2)
        t = jnp.broadcast_to(
            targets.seg_masks[None].astype(jnp.float32), (L, B, T, S)
        )
        sv = seg_valid[None, :, None, :]

        if self.use_droploss:
            pred_fg = (x > 0).astype(jnp.float32) * sv
            inter = (pred_fg * t).sum(-1)
            ssum = (pred_fg + t * sv).sum(-1)
            iou = inter / jnp.maximum(ssum, 1e-8)
            w = (iou >= self.droploss_iou_thresh).astype(jnp.float32)
        else:
            w = jnp.ones((L, B, T), jnp.float32)
        w = w * t_valid

        num_masks = jnp.maximum(t_valid.sum(-1), 1.0)            # (L, B)
        n_seg = jnp.maximum(seg_valid.sum(-1), 1.0)[None, :, None]

        xf = x.astype(jnp.float32)
        bce = (jax.nn.softplus(-xf) * t + jax.nn.softplus(xf) * (1.0 - t)) * sv
        # per instance: mean over the scene's segments; per scene: weighted sum
        # over matched instances / matched count; summed over scenes -> (L,)
        loss_mask = (((bce.sum(-1) / n_seg) * w).sum(-1) / num_masks).sum(-1)

        sig = jax.nn.sigmoid(xf) * sv
        numerator = 2.0 * (sig * t).sum(-1)
        denominator = sig.sum(-1) + (t * sv).sum(-1)
        dice = w * (1.0 - (numerator + 1.0) / (denominator + 1.0))
        loss_dice = (dice.sum(-1) / num_masks).sum(-1)

        return {"loss_mask": loss_mask, "loss_dice": loss_dice}

    # ------------------------------------------------------------ noise robust
    def _loss_noise_robust(self, pred_masks_vox, targets: Targets, matched_q,
                           batch: SceneBatch, triplane: TriplaneMaps):
        L = matched_q.shape[0]
        Lv = pred_masks_vox.shape[0]
        bidx = batch.batch_idx
        out = []
        for l in range(L):
            lv = l if Lv == L else Lv - 1
            vox = pred_masks_vox[lv]                              # (N0, Q)
            q_of_t = jnp.take(jnp.clip(matched_q[l], 0), bidx, axis=0)  # (N0, T)
            pred = jnp.take_along_axis(vox, q_of_t, axis=1)       # (N0, T)
            tv = targets.valid & (matched_q[l] >= 0)
            out.append(
                triplane_projection_loss(
                    jax.nn.sigmoid(pred.astype(jnp.float32)),
                    targets.vox_masks.astype(jnp.float32),
                    triplane,
                    batch.valid,
                    tv,
                    batch.batch_size,
                )
            )
        return jnp.stack(out)


class CrossEntropyLoss:
    """Plain semantic-segmentation cross entropy with an ignore index
    (reference conf/loss/cross_entropy.yaml -> torch.nn.CrossEntropyLoss):
    the criterion of the MinkUNet/ResNet semantic baselines."""

    def __init__(self, ignore_index: int = 255):
        self.ignore_index = int(ignore_index)

    def __call__(self, logits, labels):
        import jax.numpy as jnp

        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = labels != self.ignore_index
        safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        return nll.sum() / jnp.maximum(valid.sum(), 1)
