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
