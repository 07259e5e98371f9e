"""Image IO + geometric transforms (PIL/numpy host-side).

The reference delegates these to albumentations/cv2; here a minimal PIL-based
implementation keeps the host pipeline dependency-free. Letterbox semantics
match the reference pose pipeline (LongestMaxSize -> pad -> resize,
reference: training/lightning/pose_estimation/datamodule.py:125-145).
"""

from __future__ import annotations

import pathlib
from typing import Tuple

import numpy as np

try:
    from PIL import Image

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def load_image(path) -> np.ndarray:
    """Load an RGB uint8 HWC image."""
    if not _HAVE_PIL:
        raise RuntimeError("PIL not available")
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def resize_image(img: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize uint8 HWC."""
    if img.shape[:2] == tuple(hw):
        return img
    im = Image.fromarray(img)
    return np.asarray(im.resize((hw[1], hw[0]), Image.BILINEAR))


def letterbox(
    img: np.ndarray, size: int, pad_value: int = 0
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """LongestMaxSize + center-pad to a square.

    Returns (image, scale, (pad_top, pad_left)) so annotations can be mapped.
    """
    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = resize_image(img, (nh, nw))
    out = np.full((size, size, img.shape[2]), pad_value, img.dtype)
    top = (size - nh) // 2
    left = (size - nw) // 2
    out[top : top + nh, left : left + nw] = resized
    return out, scale, (top, left)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
