"""Training objectives (actor parity).

Parity targets: lib/train/actors/mixformer_rgbt.py:127-168 and
actors/mixformer.py:50-92 — CIoU + L1 on xyxy box vectors (gt clamped to
[0,1]), weighted by TRAIN.IOU_WEIGHT / TRAIN.L1_WEIGHT; when SPM training,
BCE-with-logits score loss REPLACES the box loss (weighted by SCORE_WEIGHT).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from multi_modal_tracking_tpu.ops.boxes import (box_cxcywh_to_xyxy, box_xywh_to_xyxy,
                                                ciou, l1_loss)


def box_losses(pred_boxes: jax.Array, gt_xywh: jax.Array,
               iou_weight: float, l1_weight: float) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """pred_boxes: (B, N, 4) cxcywh in [0,1]; gt_xywh: (B, 4) normalised."""
    B, N, _ = pred_boxes.shape
    pred_vec = box_cxcywh_to_xyxy(pred_boxes).reshape(-1, 4)
    gt_vec = jnp.clip(box_xywh_to_xyxy(gt_xywh), 0.0, 1.0)
    gt_vec = jnp.repeat(gt_vec[:, None, :], N, axis=1).reshape(-1, 4)
    cious, ious = ciou(pred_vec, gt_vec)
    ciou_l = (1.0 - cious).mean()
    l1 = l1_loss(pred_vec, gt_vec)
    total = iou_weight * ciou_l + l1_weight * l1
    return total, {"Loss/total": total, "Loss/ciou": ciou_l, "Loss/l1": l1,
                   "IoU": ious.mean()}


def score_loss(pred_scores: jax.Array, labels: jax.Array,
               score_weight: float) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """BCE-with-logits on SPM confidence (replaces box loss in stage 2)."""
    bce = optax.sigmoid_binary_cross_entropy(pred_scores.reshape(-1),
                                             labels.reshape(-1)).mean()
    total = score_weight * bce
    return total, {"Loss/total": total, "Loss/scores": bce}


def lb_hinge(prediction: jax.Array, label: jax.Array,
             threshold: float = 0.05, clip: Optional[float] = None) -> jax.Array:
    """Lower-bound hinge MSE (lib/utils/classification_loss.py:6-33 LBHinge,
    also duplicated at lib/utils/box_ops.py:274-300): where the label is below
    `threshold` the sample is negative and only positive predictions are
    penalised (relu); positives use plain MSE against the masked label."""
    negative = (label < threshold).astype(prediction.dtype)
    positive = 1.0 - negative
    pred = negative * jax.nn.relu(prediction) + positive * prediction
    loss = jnp.mean((pred - positive * label) ** 2)
    if clip is not None:
        loss = jnp.minimum(loss, clip)
    return loss


def iou_pred_loss(pred: jax.Array, target: jax.Array,
                  weight: Optional[jax.Array] = None,
                  reduction: str = "mean") -> jax.Array:
    """-log IoU loss on (left, right, top, bottom) center-offset encodings
    (lib/utils/box_ops.py:217-255 IOULoss; column order [l, r, t, b] per the
    reference's indexing pred[:,0]=left, [:,1]=right, [:,2]=top, [:,3]=bottom)."""
    pl, pr, pt, pb = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    tl, tr, tt, tb = target[:, 0], target[:, 1], target[:, 2], target[:, 3]
    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)
    w_i = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    h_i = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    inter = w_i * h_i
    union = target_area + pred_area - inter
    losses = -jnp.log((inter + 1.0) / (union + 1.0))
    if weight is not None:
        wsum = weight.sum()
        return jnp.where(wsum > 0, (losses * weight).sum() / jnp.maximum(wsum, 1e-8),
                         losses.mean() if reduction == "mean" else losses.sum())
    return losses.mean() if reduction == "mean" else losses.sum()


def _gather_feat_hw(feat: jax.Array, ind: jax.Array) -> jax.Array:
    """Gather per-image feature vectors at flat spatial indices:
    feat (B, H*W, C), ind (B,) -> (B, C)
    (lib/utils/box_ops.py:257-271 _tranpose_and_gather_feat/_gather_feat,
    NHWC already so no permute needed)."""
    return jnp.take_along_axis(feat, ind[:, None, None], axis=1)[:, 0]


def reg_loss(output: jax.Array, ind: jax.Array, target: jax.Array,
             radius: int = 1, norm: float = 1.0 / 20.0) -> jax.Array:
    """Center-vicinity ltrb regression loss (lib/utils/box_ops.py:167-215
    REGLoss with loss_type='iou').

    output: (B, H, W, 4) ltrb map (NHWC — reference is NCHW (B,4,W,H)),
    ind: (B,) flat center indices (h*W + w), target: (B, 4) ltrb at center.
    For every offset (rw, rh) in the radius window the target offsets are
    shifted by `norm` and the prediction gathered at the shifted center; an
    offset contributes only if — as in the reference's batch-level `continue`
    checks at :194-198 — ALL its shifted targets/centers are valid. The
    whole window is computed and masked (static shapes for XLA); if no
    offset is valid, falls back to the unshifted center loss (:205-208)."""
    B, H, W, D = output.shape
    feat = output.reshape(B, H * W, D)
    cw = (ind % W).astype(jnp.float32)
    ch = jnp.floor_divide(ind, W).astype(jnp.float32)

    center_pred = _gather_feat_hw(feat, ind)
    center_loss = iou_pred_loss(center_pred, target)

    losses, valids = [], []
    for rw in range(-radius, radius + 1):
        for rh in range(-radius, radius + 1):
            t = jnp.stack([target[:, 0] + rw * norm, target[:, 1] - rw * norm,
                           target[:, 2] + rh * norm, target[:, 3] - rh * norm], axis=1)
            ok_t = jnp.all(t >= 0.0)
            # rows bounded by H (the reference checks both axes against
            # `width` — box_ops.py:196-197 — which is only correct on the
            # square maps it ever uses; we bound each axis properly)
            ok_c = jnp.all((ch + rh >= 0) & (ch + rh < H) & (cw + rw >= 0) & (cw + rw < W))
            ind_c = ((ch + rh) * W + (cw + rw)).astype(ind.dtype)
            ind_c = jnp.clip(ind_c, 0, H * W - 1)
            pred = _gather_feat_hw(feat, ind_c)
            losses.append(iou_pred_loss(pred, t))
            valids.append(ok_t & ok_c)
    losses = jnp.stack(losses)
    valid = jnp.stack(valids).astype(losses.dtype)
    n_valid = valid.sum()
    window_loss = (losses * valid).sum() / jnp.maximum(n_valid, 1.0)
    return jnp.where(n_valid > 0, window_loss, center_loss)
