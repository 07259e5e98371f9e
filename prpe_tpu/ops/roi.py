"""Fixed-shape on-device crop-and-resize (ROI-align-style bilinear sampling).

The reference cascade concept crops detected persons/faces on the host (PIL /
torchvision); here cropping is a gather + two small matmul-style interpolation
contractions that stay on-device, so the detect -> crop -> embed -> pose
cascade never round-trips to host (BASELINE.json north star).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def crop_and_resize(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Bilinearly sample axis-aligned crops from one image.

    Args:
      image: (H, W, C).
      boxes: (K, 4) xyxy in pixel coordinates (may be fractional/degenerate;
        clipped to the image).
      out_hw: output (h, w).

    Returns:
      (K, h, w, C) crops.
    """
    h, w = image.shape[:2]
    oh, ow = out_hw
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    # degenerate boxes (zero padding slots) produce zero-area crops at (0,0);
    # callers mask them out
    bw = jnp.maximum(x2 - x1, 1e-3)
    bh = jnp.maximum(y2 - y1, 1e-3)

    # sample centers of a regular grid inside the box (align_corners=False)
    ys = (jnp.arange(oh, dtype=image.dtype) + 0.5) / oh  # (oh,)
    xs = (jnp.arange(ow, dtype=image.dtype) + 0.5) / ow
    sy = y1[:, None] + ys[None, :] * bh[:, None] - 0.5  # (K, oh)
    sx = x1[:, None] + xs[None, :] * bw[:, None] - 0.5  # (K, ow)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    sx = jnp.clip(sx, 0.0, w - 1.0)

    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, h - 1)
    x1i = jnp.minimum(x0 + 1, w - 1)
    fy = (sy - y0)[..., None]  # (K, oh, 1)
    fx = (sx - x0)[..., None]  # (K, ow, 1)

    top = image[y0]  # (K, oh, W, C)
    bot = image[y1i]
    wy = fy[:, :, :, None]  # (K, oh, 1, 1)
    rows = top * (1 - wy) + bot * wy

    return _interp_cols(rows, x0, x1i, fx)


def _interp_cols(rows, x0, x1i, fx):
    # rows: (K, oh, W, C); x0/x1i: (K, ow); fx: (K, ow, 1)
    k = rows.shape[0]

    def per_crop(r, c0, c1, f):
        left = r[:, c0]  # (oh, ow, C)
        right = r[:, c1]
        return left * (1 - f) + right * f

    return jax.vmap(per_crop)(rows, x0, x1i, fx)


def crop_and_resize_batch(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    box_image_idx: jnp.ndarray,
    out_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Crop K boxes from a batch of images.

    Args:
      images: (B, H, W, C).
      boxes: (K, 4) xyxy pixels.
      box_image_idx: (K,) int index into the batch for each box.

    Returns: (K, h, w, C).
    """
    gathered = images[box_image_idx]  # (K, H, W, C)

    def one(img, box):
        return crop_and_resize(img, box[None], out_hw)[0]

    return jax.vmap(one)(gathered, boxes)
