"""RetinaNet focal + smooth-L1 losses, fully vectorized over (batch, anchors).

Math parity with the reference FocalLoss (reference: Detectors/retinanet/losses.py:33-168)
— IoU assignment thresholds <0.4 negative / >=0.5 positive / in-between ignored
(losses.py:82-92), alpha-balanced focal BCE normalized by clamp(num_pos, 1)
(losses.py:95-121), smooth-L1 (beta=1/9) on std-normalized box deltas for positive
anchors (losses.py:142-162) — but the reference's per-image python loop over the batch
is replaced by a vmapped, shape-static computation on padded annotations (boxes padded
with -1 rows, matching the reference's pad-collator dataset_concepts.py:185-205).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import box_iou, encode_boxes


def _per_image_focal(
    cls_pred: jnp.ndarray,  # (A, C) post-sigmoid probabilities
    reg_pred: jnp.ndarray,  # (A, 4)
    anchors: jnp.ndarray,  # (A, 4)
    gt: jnp.ndarray,  # (M, 5) padded with -1 rows: x1,y1,x2,y2,class
    alpha: float,
    gamma: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    A, C = cls_pred.shape
    valid_gt = gt[:, 4] >= 0  # (M,)
    n_gt = jnp.sum(valid_gt)

    iou = box_iou(anchors, gt[:, :4])  # (A, M)
    iou = jnp.where(valid_gt[None, :], iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)

    has_gt = n_gt > 0
    positive = (best_iou >= 0.5) & has_gt
    # with no GT at all every anchor is negative (reference handles the no-annotation
    # image by training all anchors toward 0, losses.py:60-76)
    negative = jnp.where(has_gt, best_iou < 0.4, jnp.ones((A,), bool))
    ignored = ~(positive | negative)

    cls_p = jnp.clip(cls_pred.astype(jnp.float32), 1e-4, 1.0 - 1e-4)
    gt_class = gt[best_gt, 4].astype(jnp.int32)
    targets = positive[:, None] & (jax.nn.one_hot(gt_class, C, dtype=bool))

    alpha_factor = jnp.where(targets, alpha, 1.0 - alpha)
    focal_weight = jnp.where(targets, 1.0 - cls_p, cls_p) ** gamma
    bce = -jnp.where(targets, jnp.log(cls_p), jnp.log(1.0 - cls_p))
    cls_loss = alpha_factor * focal_weight * bce
    cls_loss = jnp.where(ignored[:, None], 0.0, cls_loss)
    num_pos = jnp.clip(jnp.sum(positive.astype(jnp.float32)), 1.0, None)
    cls_loss = jnp.sum(cls_loss) / num_pos

    # regression on positive anchors
    matched = gt[best_gt, :4]
    reg_targets = encode_boxes(anchors, matched)
    diff = jnp.abs(reg_targets - reg_pred.astype(jnp.float32))
    # torch-style smooth L1 with beta = 1/9 (losses.py:151-160)
    reg_loss = jnp.where(diff <= 1.0 / 9.0, 0.5 * 9.0 * diff**2, diff - 0.5 / 9.0)
    reg_loss = jnp.where(positive[:, None], reg_loss, 0.0)
    reg_loss = jnp.sum(jnp.mean(reg_loss, axis=1)) / num_pos
    reg_loss = jnp.where(has_gt, reg_loss, 0.0)
    return cls_loss, reg_loss


def focal_loss(
    cls_pred: jnp.ndarray,  # (B, A, C)
    reg_pred: jnp.ndarray,  # (B, A, 4)
    anchors: jnp.ndarray,  # (A, 4)
    annotations: jnp.ndarray,  # (B, M, 5), -1-padded
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> Dict[str, jnp.ndarray]:
    cls_l, reg_l = jax.vmap(
        lambda c, r, g: _per_image_focal(c, r, anchors, g, alpha, gamma)
    )(cls_pred, reg_pred, annotations)
    out = {
        "classification": jnp.mean(cls_l),
        "regression": jnp.mean(reg_l),
    }
    out["total"] = out["classification"] + out["regression"]
    return out
