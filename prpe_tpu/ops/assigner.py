"""Task-Aligned Assigner (TAL) for anchor-free YOLO training.

A scatter-free, fully-vectorized re-derivation of the reference assigner
(reference: training/yolopt/util.py:482-574). The reference implementation
leans on boolean advanced indexing and ``scatter_add_`` with data-dependent
shapes; here every step is dense masked math with static shapes (one-hot,
top_k, argmax), so the whole assigner jits and differentiates cleanly (it is
wrapped in stop_gradient by the loss, as in the reference's @no_grad).

Ground truths are padded per-image to a static ``M`` and masked by
``gt_mask`` — the TPU equivalent of the reference's per-image variable-count
gt tensor built at util.py:719-739.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from prpe_tpu.ops.boxes import ciou


class AssignResult(NamedTuple):
    target_bboxes: jnp.ndarray  # (B, A, 4) xyxy, absolute units
    target_scores: jnp.ndarray  # (B, A, nc) soft alignment-weighted one-hot
    fg_mask: jnp.ndarray  # (B, A) bool


def assign(
    pd_scores: jnp.ndarray,
    pd_bboxes: jnp.ndarray,
    anchor_points: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    *,
    num_classes: int,
    top_k: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    """Assign padded ground truths to anchors.

    Args:
      pd_scores: (B, A, nc) predicted class probabilities (post-sigmoid).
      pd_bboxes: (B, A, 4) decoded xyxy boxes, absolute units.
      anchor_points: (A, 2) absolute anchor centers.
      gt_labels: (B, M) int class ids of padded gts.
      gt_bboxes: (B, M, 4) xyxy absolute.
      gt_mask: (B, M) validity of each padded gt slot.

    Returns:
      AssignResult with per-anchor targets.
    """
    b, a, nc = pd_scores.shape
    m = gt_bboxes.shape[1]
    gt_maskf = gt_mask.astype(pd_scores.dtype)

    # --- candidate anchors inside each gt box ------------------------------
    lt = gt_bboxes[..., None, :2]  # (B, M, 1, 2)
    rb = gt_bboxes[..., None, 2:]
    deltas = jnp.concatenate(
        [anchor_points[None, None] - lt, rb - anchor_points[None, None]], axis=-1
    )  # (B, M, A, 4)
    mask_in_gts = (deltas.min(axis=-1) > eps).astype(pd_scores.dtype)  # (B, M, A)
    cand_mask = mask_in_gts * gt_maskf[..., None]

    # --- alignment metric: score^alpha * iou^beta --------------------------
    labels = jnp.clip(gt_labels, 0, nc - 1)  # (B, M)
    # pd_scores[b, :, labels[b, m]] -> (B, M, A)
    scores_bma = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1), labels[:, :, None], axis=1
    )
    bbox_scores = scores_bma * cand_mask

    overlaps = jnp.clip(
        ciou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :]), 0.0
    ) * cand_mask  # (B, M, A)

    align_metric = bbox_scores**alpha * overlaps**beta

    # --- top-k candidate selection per gt ----------------------------------
    topk_metrics, topk_idx = jax.lax.top_k(align_metric, top_k)  # (B, M, K)
    # invalid gts point all their slots at anchor 0; the count>1 rule below
    # then zeroes them (mirrors masked_fill_ + scatter_add_ at util.py:527-533)
    topk_idx = jnp.where(gt_mask[..., None], topk_idx, 0)
    counts = jax.nn.one_hot(topk_idx, a, dtype=pd_scores.dtype).sum(axis=-2)  # (B, M, A)
    mask_top_k = jnp.where(counts > 1, 0.0, counts)

    mask_pos = mask_top_k * cand_mask  # (B, M, A)

    # --- resolve anchors claimed by multiple gts: keep max-IoU gt ----------
    fg_count = mask_pos.sum(axis=-2)  # (B, A)
    max_overlap_gt = overlaps.argmax(axis=1)  # (B, A)
    is_max_overlap = jax.nn.one_hot(
        max_overlap_gt, m, dtype=mask_pos.dtype, axis=1
    )  # (B, M, A)
    mask_pos = jnp.where((fg_count > 1)[:, None, :], is_max_overlap, mask_pos)
    fg_mask = mask_pos.sum(axis=-2) > 0  # (B, A)

    target_gt_idx = mask_pos.argmax(axis=-2)  # (B, A)

    # --- gather targets -----------------------------------------------------
    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)  # (B, A)
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[..., None], axis=1
    )  # (B, A, 4)

    target_scores = jax.nn.one_hot(target_labels, nc, dtype=pd_scores.dtype)
    target_scores = target_scores * fg_mask[..., None].astype(pd_scores.dtype)

    # --- normalize scores by per-gt alignment statistics --------------------
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(axis=-1, keepdims=True)  # (B, M, 1)
    pos_overlap = (overlaps * mask_pos).max(axis=-1, keepdims=True)
    norm_align = (align_metric * pos_overlap / (pos_align + eps)).max(axis=-2)  # (B, A)
    target_scores = target_scores * norm_align[..., None]

    return AssignResult(
        target_bboxes=target_bboxes, target_scores=target_scores, fg_mask=fg_mask
    )
