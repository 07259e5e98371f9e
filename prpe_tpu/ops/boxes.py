"""Box geometry ops: format conversion and IoU family.

Pure jnp re-derivations of the reference's box math:
  * cxcywh <-> xyxy (reference: training/yolopt/util.py:76-82)
  * pairwise CIoU (reference: training/yolopt/util.py:303-329)
  * N x M IoU matrix with GIoU/DIoU/CIoU variants
    (reference: training/lightning/utils.py:8-77)

All functions broadcast over leading dims and are jit/vmap safe.
Boxes are ``(..., 4)`` float arrays.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def cxcywh_to_xyxy(box: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(box, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def xyxy_to_cxcywh(box: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(box, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def box_area(box: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes -> (...,)."""
    w = jnp.maximum(box[..., 2] - box[..., 0], 0.0)
    h = jnp.maximum(box[..., 3] - box[..., 1], 0.0)
    return w * h


def iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Plain elementwise IoU of xyxy boxes (broadcasting), -> (...,)."""
    lt = jnp.maximum(box1[..., :2], box2[..., :2])
    rb = jnp.minimum(box1[..., 2:], box2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(box1) + box_area(box2) - inter + eps
    return inter / union


def ciou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU, matching the reference semantics bit-for-bit.

    The reference (training/yolopt/util.py:303-329) adds ``eps`` to the
    heights only, clamps the intersection at 0, and stops gradient through
    the aspect-ratio tradeoff ``alpha``. Broadcasts; returns (...,).
    """
    b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
    b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0.0) * (
        jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0.0)
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou_ = inter / union

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4.0
    v = (4.0 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou_ + (1.0 + eps)))
    return iou_ - (rho2 / c2 + v * alpha)


def pairwise_iou(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    kind: str = "iou",
    eps: float = 1e-7,
) -> jnp.ndarray:
    """IoU matrix between ``(..., N, 4)`` and ``(..., M, 4)`` -> ``(..., N, M)``.

    ``kind`` in {iou, giou, diou, ciou} (reference:
    training/lightning/utils.py:8-77 implements the same family).
    """
    b1 = boxes1[..., :, None, :]
    b2 = boxes2[..., None, :, :]
    if kind == "iou":
        return iou(b1, b2, eps)
    if kind == "ciou":
        return ciou(b1, b2, eps)

    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(b1) + box_area(b2) - inter + eps
    iou_ = inter / union

    clt = jnp.minimum(b1[..., :2], b2[..., :2])
    crb = jnp.maximum(b1[..., 2:], b2[..., 2:])
    cwh = jnp.clip(crb - clt, 0.0)
    if kind == "giou":
        c_area = cwh[..., 0] * cwh[..., 1] + eps
        return iou_ - (c_area - union) / c_area
    if kind == "diou":
        c2 = cwh[..., 0] ** 2 + cwh[..., 1] ** 2 + eps
        center1 = (b1[..., :2] + b1[..., 2:]) / 2
        center2 = (b2[..., :2] + b2[..., 2:]) / 2
        rho2 = jnp.sum((center2 - center1) ** 2, axis=-1)
        return iou_ - rho2 / c2
    raise ValueError(f"unknown iou kind: {kind}")
