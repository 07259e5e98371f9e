"""Loss functions: YOLO detection (CIoU + DFL + BCE), pose (OKS-weighted MSE
with online hard keypoint mining, OKS log loss), and classification utilities.

Re-derivations of:
  * ComputeLoss / BoxLoss / df_loss (reference: training/yolopt/util.py:637-769)
  * JointsMSELoss + OHKM (reference: training/lightning/pose_estimation/module.py:39-111)
  * OKSLoss (reference: training/lightning/pose_estimation/module.py:114-152)
  * QFL / VFL / Focal variants (reference: training/yolopt/util.py:577-634)

All are dense masked ops with static shapes; anything the reference computes
with boolean indexing (``pred_bboxes[fg_mask]``) becomes a multiply-by-mask.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from prpe_tpu.ops.anchors import dfl_decode, make_anchors
from prpe_tpu.ops.assigner import assign
from prpe_tpu.ops.boxes import ciou, cxcywh_to_xyxy
from prpe_tpu.ops.heatmap import COCO_SIGMAS


# --------------------------------------------------------------------------
# elementwise classification losses
# --------------------------------------------------------------------------

def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy on logits, elementwise."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """CE against int labels, (..., C) x (...,) -> (...,)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - true_logit


def quality_focal_loss(logits, targets, beta: float = 2.0):
    """QFL (reference: training/yolopt/util.py:577-585)."""
    bce = bce_with_logits(logits, targets)
    return jnp.abs(targets - jax.nn.sigmoid(logits)) ** beta * bce


def varifocal_loss(logits, targets, alpha: float = 0.75, gamma: float = 2.0,
                   iou_weighted: bool = True):
    """VFL (reference: training/yolopt/util.py:588-611)."""
    p = jax.nn.sigmoid(logits)
    pos = (targets > 0.0).astype(logits.dtype)
    neg_w = alpha * jnp.abs(p - targets) ** gamma * (1.0 - pos)
    w = (targets * pos if iou_weighted else pos) + neg_w
    return bce_with_logits(logits, targets) * w


def focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 1.5):
    """Focal loss (reference: training/yolopt/util.py:614-634)."""
    loss = bce_with_logits(logits, targets)
    if alpha > 0:
        loss = loss * (targets * alpha + (1 - targets) * (1 - alpha))
    if gamma > 0:
        p = jax.nn.sigmoid(logits)
        p_t = targets * p + (1 - targets) * (1 - p)
        loss = loss * (1.0 - p_t) ** gamma
    return loss


# --------------------------------------------------------------------------
# YOLO detection loss
# --------------------------------------------------------------------------

class DetectionLoss(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def _df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distribution Focal Loss per anchor (reference: util.py:657-667).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous bin coords.
    Returns (...,) mean over the 4 sides.
    """
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    left = softmax_cross_entropy(pred_dist, tl)
    reg_max = pred_dist.shape[-1]
    right = softmax_cross_entropy(pred_dist, jnp.clip(tr, 0, reg_max - 1))
    return (left * wl + right * wr).mean(axis=-1)


def yolo_detection_loss(
    level_outputs: Sequence[jnp.ndarray],
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    *,
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    assigner_top_k: int = 10,
    assigner_alpha: float = 0.5,
    assigner_beta: float = 6.0,
) -> DetectionLoss:
    """Full YOLOv11 training loss (reference: training/yolopt/util.py:670-769).

    Args:
      level_outputs: per-FPN-level NHWC maps (B, H_l, W_l, 4*reg_max + nc).
      gt_labels: (B, M) int padded gt classes.
      gt_boxes: (B, M, 4) normalized cxcywh in [0, 1] (YOLO-txt convention,
        as produced by the reference collate at yolopt/dataset.py:178-193).
      gt_mask: (B, M) validity.

    Returns gained loss components; ``total`` is the sum.
    """
    b = level_outputs[0].shape[0]
    no = 4 * reg_max + num_classes
    level_hw = [tuple(x.shape[1:3]) for x in level_outputs]
    dtype = jnp.float32

    # (B, A, no) — channels-last flatten, same anchor order as make_anchors
    x = jnp.concatenate(
        [o.reshape(b, -1, no) for o in level_outputs], axis=1
    ).astype(dtype)
    pred_dist, pred_scores = x[..., : 4 * reg_max], x[..., 4 * reg_max :]

    anchor_points, stride_tensor = make_anchors(level_hw, strides, dtype=dtype)

    # scale gt boxes to input pixels, convert to xyxy
    input_hw = jnp.array(
        [level_hw[0][1] * strides[0], level_hw[0][0] * strides[0]], dtype=dtype
    )  # (W, H) — matches input_size[[1,0,1,0]] at util.py:731
    scale = jnp.concatenate([input_hw, input_hw])  # (4,) W,H,W,H
    gt_xyxy = cxcywh_to_xyxy(gt_boxes.astype(dtype) * scale)
    # reference derives validity from box-sum > 0 (util.py:741); we AND it
    # with the explicit pad mask
    gt_valid = gt_mask & (jnp.abs(gt_xyxy).sum(-1) > 0)

    pred_bboxes = dfl_decode(pred_dist, anchor_points, reg_max)  # grid units

    assigned = assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes) * stride_tensor,
        anchor_points * stride_tensor,
        gt_labels,
        gt_xyxy,
        gt_valid,
        num_classes=num_classes,
        top_k=assigner_top_k,
        alpha=assigner_alpha,
        beta=assigner_beta,
    )
    target_bboxes, target_scores, fg_mask = (
        jax.lax.stop_gradient(assigned.target_bboxes),
        jax.lax.stop_gradient(assigned.target_scores),
        jax.lax.stop_gradient(assigned.fg_mask),
    )

    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

    loss_cls = bce_with_logits(pred_scores, target_scores).sum() / target_scores_sum

    # box + DFL, masked instead of gathered
    fg = fg_mask.astype(dtype)
    weight = target_scores.sum(-1) * fg  # (B, A)
    target_grid = target_bboxes / stride_tensor  # grid units

    iou_fg = ciou(pred_bboxes, target_grid)  # (B, A)
    loss_box = ((1.0 - iou_fg) * weight).sum() / target_scores_sum

    # DFL target: lt/rb distances clamped into the bin range
    lt = anchor_points - target_grid[..., :2]
    rb = target_grid[..., 2:] - anchor_points
    dfl_target = jnp.clip(
        jnp.concatenate([lt, rb], axis=-1), 0.0, reg_max - 1 - 0.01
    )
    dist = pred_dist.reshape(*pred_dist.shape[:-1], 4, reg_max)
    loss_dfl = (_df_loss(dist, dfl_target) * weight).sum() / target_scores_sum

    return DetectionLoss(
        total=loss_box * box_gain + loss_cls * cls_gain + loss_dfl * dfl_gain,
        box=loss_box * box_gain,
        cls=loss_cls * cls_gain,
        dfl=loss_dfl * dfl_gain,
    )


# --------------------------------------------------------------------------
# pose losses
# --------------------------------------------------------------------------

def joints_mse_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    target_weight: jnp.ndarray,
    *,
    use_target_weight: bool = True,
    use_ohkm: bool = True,
    ohkm_topk: int = 8,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """OKS-sigma-weighted heatmap MSE with Online Hard Keypoint Mining
    (reference: training/lightning/pose_estimation/module.py:39-111).

    pred/target: (B, K, H, W); target_weight: (B, K).
    """
    b, k = pred.shape[:2]
    kw = 1.0 / (COCO_SIGMAS.astype(pred.dtype) + 1e-8)
    kw = kw / kw.mean()

    per_joint = ((pred - target) ** 2).reshape(b, k, -1).mean(axis=-1)  # (B, K)
    if use_target_weight:
        per_joint = per_joint * (target_weight * kw[None, :])

    if use_ohkm:
        topk_vals, topk_idx = jax.lax.top_k(jax.lax.stop_gradient(per_joint), ohkm_topk)
        mask = jax.nn.one_hot(topk_idx, k, dtype=pred.dtype).sum(axis=1)  # (B, K)
        loss = (per_joint * mask).sum() / (b * ohkm_topk)
    else:
        loss = per_joint.mean()
    return loss * loss_weight


def oks_loss(
    pred_coords: jnp.ndarray,
    target_coords: jnp.ndarray,
    target_vis: jnp.ndarray,
    areas: jnp.ndarray,
    *,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Negative-log Object Keypoint Similarity loss
    (reference: training/lightning/pose_estimation/module.py:114-152).

    pred/target coords: (B, K, 2) normalized; target_vis: (B, K); areas: (B,).
    """
    sig = COCO_SIGMAS.astype(pred_coords.dtype)
    d2 = ((pred_coords - target_coords) ** 2).sum(-1)  # (B, K)
    squared_sigma = 2.0 * sig[None, :] ** 2
    oks = jnp.exp(-d2 / (2.0 * areas[:, None] * squared_sigma + 1e-8))
    vis = (target_vis > 0).astype(pred_coords.dtype)
    loss = -jnp.log(jnp.clip(oks * vis, 1e-8))
    num_vis = jnp.clip(vis.sum(axis=1), 1.0)
    return ((loss * vis).sum(axis=1) / num_vis).mean() * loss_weight


def pck_accuracy(
    pred_coords: jnp.ndarray,
    target_coords: jnp.ndarray,
    target_vis: jnp.ndarray,
    areas: jnp.ndarray,
    *,
    alpha: float = 0.2,
) -> jnp.ndarray:
    """PCK@alpha*sqrt(area) (reference: module.py:431-442). Returns scalar."""
    threshold = alpha * jnp.sqrt(jnp.maximum(areas, 0.0))[:, None]  # (B, 1)
    vis = target_vis > 0
    dists = jnp.linalg.norm(pred_coords - target_coords, axis=-1)  # (B, K)
    correct = (dists < threshold) & vis
    return correct.astype(jnp.float32).mean()
