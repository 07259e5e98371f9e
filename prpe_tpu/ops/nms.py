"""Fixed-shape, fully on-device non-maximum suppression.

The reference pipeline is host-bound and dynamic: boolean-mask ``nonzero``,
per-image Python loops, a wall-clock bailout, and the torchvision C++/CUDA
``ops.nms`` kernel (reference: training/yolopt/util.py:123-169, duplicated at
training/lightning/utils.py:103-158). None of that maps to XLA.

The TPU-native design:
  1. ``top_k`` pre-selection of a *static* candidate count K from all anchors
     (replaces conf-filter + sort + ``max_nms`` cap),
  2. one (K, K) IoU matrix on the MXU-friendly vector units,
  3. exact greedy suppression as a ``lax.fori_loop`` scan over the score-sorted
     candidates (each step is one (K,) vector op),
  4. results padded to ``max_det`` with a validity mask — shape never depends
     on the data, so the whole thing lives inside a single jitted program.

Semantics parity with the reference: per-class separation uses the same
class-offset trick (class_id * max_wh added to coordinates), confidence
threshold 1e-3, IoU threshold 0.65, <=300 detections.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from prpe_tpu.ops.boxes import cxcywh_to_xyxy, pairwise_iou


class Detections(NamedTuple):
    """Fixed-size batch of detections.

    boxes:  (..., max_det, 4) xyxy
    scores: (..., max_det)
    classes:(..., max_det) int32
    valid:  (..., max_det) bool
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray

    @property
    def count(self) -> jnp.ndarray:
        return self.valid.sum(axis=-1)


def greedy_suppression_mask(
    iou: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float
) -> jnp.ndarray:
    """Exact greedy NMS keep-mask over score-desc-sorted candidates.

    Args:
      iou: (K, K) IoU matrix of sorted candidates.
      valid: (K,) candidate validity (above conf threshold).
      iou_threshold: suppression threshold.

    Returns:
      keep: (K,) bool.
    """
    k = iou.shape[0]
    suppress = iou > iou_threshold

    def body(i, state):
        keep, suppressed = state
        is_kept = jnp.logical_and(valid[i], jnp.logical_not(suppressed[i]))
        keep = keep.at[i].set(is_kept)
        suppressed = jnp.logical_or(suppressed, jnp.logical_and(is_kept, suppress[i]))
        return keep, suppressed

    keep0 = jnp.zeros((k,), dtype=bool)
    suppressed0 = jnp.zeros((k,), dtype=bool)
    keep, _ = jax.lax.fori_loop(0, k, body, (keep0, suppressed0))
    return keep


def _nms_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    *,
    conf_threshold: float,
    iou_threshold: float,
    max_det: int,
    pre_nms_top_k: int,
    max_wh: float,
    use_pallas: bool,
) -> Detections:
    """Batched fixed-shape NMS core.

    Args:
      boxes: (B, N, 4) xyxy. scores/classes: (B, N).
    """
    n = boxes.shape[-2]
    k = min(pre_nms_top_k, n)

    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    gated = jnp.where(scores > conf_threshold, scores, neg_inf)
    top_scores, top_idx = jax.lax.top_k(gated, k)  # (B, K)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=-2)
    top_classes = jnp.take_along_axis(classes, top_idx, axis=-1)
    valid = top_scores > conf_threshold

    # class-offset trick: boxes of different classes never overlap. The
    # offset math must be fp32: with bf16 boxes and nc > 1, offsets up to
    # class_id * 7680 land where bf16 spacing is ~4096 px, collapsing
    # same-class boxes to identical coordinates (advisor finding, round 1).
    off_boxes = (
        top_boxes.astype(jnp.float32)
        + top_classes.astype(jnp.float32)[..., None] * max_wh
    )

    # import only on the kernel path: CPU/lax callers must not depend on
    # the pallas TPU modules importing cleanly
    if use_pallas:
        from prpe_tpu.ops.pallas.nms_kernel import (
            MAX_PALLAS_K, pallas_greedy_nms,
        )

    if use_pallas and k <= MAX_PALLAS_K:
        keep = pallas_greedy_nms(off_boxes, valid, iou_threshold)
    else:

        def one(bx, va):
            iou = pairwise_iou(bx, bx, kind="iou")
            return greedy_suppression_mask(iou, va, iou_threshold)

        keep = jax.vmap(one)(off_boxes, valid)

    # compact kept detections to the front, cap at max_det
    kk = min(max_det, k)
    keep_scores = jnp.where(keep, top_scores, neg_inf)
    det_scores, det_idx = jax.lax.top_k(keep_scores, kk)  # (B, kk)
    det_valid = jnp.isfinite(det_scores)
    det_scores = jnp.where(det_valid, det_scores, 0.0)
    det_boxes = jnp.take_along_axis(top_boxes, det_idx[..., None], axis=-2)
    det_classes = jnp.take_along_axis(top_classes, det_idx, axis=-1)
    det = Detections(
        boxes=jnp.where(det_valid[..., None], det_boxes, 0.0),
        scores=det_scores,
        classes=jnp.where(det_valid, det_classes, -1),
        valid=det_valid,
    )
    if kk < max_det:
        pad = max_det - kk
        bdims = det.scores.ndim - 1
        no_pad = ((0, 0),) * bdims
        det = Detections(
            boxes=jnp.pad(det.boxes, no_pad + ((0, pad), (0, 0))),
            scores=jnp.pad(det.scores, no_pad + ((0, pad),)),
            classes=jnp.pad(det.classes, no_pad + ((0, pad),), constant_values=-1),
            valid=jnp.pad(det.valid, no_pad + ((0, pad),)),
        )
    return det


def nms_single(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    *,
    conf_threshold: float = 0.001,
    iou_threshold: float = 0.65,
    max_det: int = 300,
    pre_nms_top_k: int = 1024,
    max_wh: float = 7680.0,
) -> Detections:
    """NMS for one image with already-split per-candidate class/score.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,) confidence of the chosen class per candidate.
      classes: (N,) int class ids.

    Returns fixed-shape :class:`Detections` of length ``max_det``.
    """
    det = _nms_batched(
        boxes[None],
        scores[None],
        classes[None],
        conf_threshold=conf_threshold,
        iou_threshold=iou_threshold,
        max_det=max_det,
        pre_nms_top_k=pre_nms_top_k,
        max_wh=max_wh,
        use_pallas=False,
    )
    return Detections(*(x[0] for x in det))


def non_max_suppression(
    outputs: jnp.ndarray,
    *,
    conf_threshold: float = 0.001,
    iou_threshold: float = 0.65,
    max_det: int = 300,
    pre_nms_top_k: int = 1024,
    max_wh: float = 7680.0,
    use_pallas: bool | None = None,
) -> Detections:
    """Batched NMS over raw decoded YOLO outputs.

    Args:
      outputs: (B, A, 4 + nc) with cxcywh boxes in pixels followed by per-class
        scores (the eval-mode head output; reference feeds the transposed
        (B, 4+nc, A) into training/yolopt/util.py:123 — we keep channels last,
        the TPU-friendly layout).
      use_pallas: run the greedy scan as the VMEM-resident Pallas kernel
        (prpe_tpu/ops/pallas/nms_kernel.py). Default: on iff the program is
        being staged for TPU — the lax fori_loop scan issues K tiny
        HBM-resident vector ops and is launch-latency-bound there.

    Returns batched fixed-shape :class:`Detections`.

    Note: like the reference's single-class fast path (util.py:149-151), each
    candidate contributes its best class only. For nc == 1 this is exact
    parity; for multi-class it matches the common YOLO deployment setting.
    """
    nc = outputs.shape[-1] - 4
    boxes = cxcywh_to_xyxy(outputs[..., :4])
    cls_scores = outputs[..., 4:]
    if nc == 1:
        scores = cls_scores[..., 0]
        classes = jnp.zeros(scores.shape, dtype=jnp.int32)
    else:
        scores = cls_scores.max(axis=-1)
        classes = cls_scores.argmax(axis=-1).astype(jnp.int32)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    return _nms_batched(
        boxes,
        scores,
        classes,
        conf_threshold=conf_threshold,
        iou_threshold=iou_threshold,
        max_det=max_det,
        pre_nms_top_k=pre_nms_top_k,
        max_wh=max_wh,
        use_pallas=use_pallas,
    )
