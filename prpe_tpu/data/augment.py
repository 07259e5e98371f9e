"""Host-side detection augmentations: mosaic-4, MixUp, HSV jitter, flip.

Re-derivations of the standalone YOLO trainer's augmentation suite
(reference: training/yolopt/dataset.py:105-176 mosaic, :382-387 mixup beta(32,32),
:274-289 HSV LUT). Implemented in numpy over uint8 HWC images with normalized
cxcywh labels ``(cls, cx, cy, w, h)`` rows.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np


def hsv_augment(
    img: np.ndarray, rng: np.random.Generator,
    h_gain: float = 0.015, s_gain: float = 0.7, v_gain: float = 0.4,
) -> np.ndarray:
    """Random HSV jitter on uint8 RGB (LUT-based like the reference)."""
    r = rng.uniform(-1, 1, 3) * [h_gain, s_gain, v_gain] + 1

    # RGB -> HSV (vectorized uint8 path)
    x = img.astype(np.float32) / 255.0
    mx = x.max(-1)
    mn = x.min(-1)
    diff = mx - mn + 1e-12
    hch = np.zeros_like(mx)
    rc, gc, bc = x[..., 0], x[..., 1], x[..., 2]
    m = mx == rc
    hch[m] = ((gc - bc) / diff)[m] % 6
    m = mx == gc
    hch[m] = ((bc - rc) / diff + 2)[m]
    m = mx == bc
    hch[m] = ((rc - gc) / diff + 4)[m]
    hch = hch / 6.0
    sch = np.where(mx > 0, diff / (mx + 1e-12), 0.0)
    vch = mx

    hch = (hch * r[0]) % 1.0
    sch = np.clip(sch * r[1], 0, 1)
    vch = np.clip(vch * r[2], 0, 1)

    # HSV -> RGB
    i = np.floor(hch * 6).astype(int) % 6
    f = hch * 6 - np.floor(hch * 6)
    p = vch * (1 - sch)
    q = vch * (1 - f * sch)
    t = vch * (1 - (1 - f) * sch)
    out = np.zeros_like(x)
    for k, (rr, gg, bb) in enumerate(
        [(vch, t, p), (q, vch, p), (p, vch, t), (p, q, vch), (t, p, vch), (vch, p, q)]
    ):
        m = i == k
        out[..., 0][m] = rr[m]
        out[..., 1][m] = gg[m]
        out[..., 2][m] = bb[m]
    return (out * 255.0 + 0.5).astype(np.uint8)


def mosaic4(
    samples: List[Tuple[np.ndarray, np.ndarray]],
    out_size: int,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Combine 4 (uint8 image, (N,5) normalized labels) into one mosaic.

    Reference: training/yolopt/dataset.py:105-176 — random center in the
    central half, each tile resized to fill its quadrant.
    """
    cx = int(rng.uniform(out_size * 0.25, out_size * 0.75))
    cy = int(rng.uniform(out_size * 0.25, out_size * 0.75))
    canvas = np.full((out_size, out_size, 3), 114, np.uint8)
    quads = [
        (0, 0, cx, cy), (cx, 0, out_size, cy),
        (0, cy, cx, out_size), (cx, cy, out_size, out_size),
    ]
    all_labels = []
    from prpe_tpu.native import resize_bilinear_u8

    for (x1, y1, x2, y2), (img, labels) in zip(quads, samples):
        qw, qh = x2 - x1, y2 - y1
        if qw <= 0 or qh <= 0:
            continue
        canvas[y1:y2, x1:x2] = resize_bilinear_u8(img, qh, qw)
        if labels.size:
            lab = labels.copy()
            lab[:, 1] = (lab[:, 1] * qw + x1) / out_size
            lab[:, 2] = (lab[:, 2] * qh + y1) / out_size
            lab[:, 3] = lab[:, 3] * qw / out_size
            lab[:, 4] = lab[:, 4] * qh / out_size
            all_labels.append(lab)
    labels = (
        np.concatenate(all_labels) if all_labels else np.zeros((0, 5), np.float32)
    )
    return canvas, labels


def mixup(
    img1: np.ndarray, lab1: np.ndarray,
    img2: np.ndarray, lab2: np.ndarray,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Beta(32, 32) image blend, labels concatenated
    (reference: training/yolopt/dataset.py:382-387)."""
    alpha = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * alpha + img2.astype(np.float32) * (1 - alpha))
    return img.astype(np.uint8), np.concatenate([lab1, lab2], axis=0)
