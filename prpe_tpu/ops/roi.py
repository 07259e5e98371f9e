"""Fixed-shape on-device crop-and-resize (ROI-align-style bilinear sampling).

The reference cascade concept crops detected persons/faces on the host (PIL /
torchvision); here cropping is a gather + bilinear blend that stays on-device,
so the detect -> crop -> embed -> pose cascade never round-trips to host
(BASELINE.json north star).

Layout note (measured on v5e): sampling gathers full source *rows*
(K, oh, W, C) and then blends columns per crop. Row gathers move long
contiguous (W*C) runs, which the TPU memory system streams at full HBM
bandwidth; a per-pixel 4-corner gather — though it reads ~30x fewer bytes —
scalarizes into tiny random accesses and measured >2x slower end-to-end in
the cascade. On TPU, contiguous-run length beats byte count.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _sample_grid(boxes: jnp.ndarray, out_hw: Tuple[int, int], src_hw, dtype):
    """Bilinear sample locations for axis-aligned boxes.

    Returns (y0, y1, fy, x0, x1, fx): int corner rows/cols (K, oh)/(K, ow)
    and fractional weights of the same shapes.
    """
    h, w = src_hw
    oh, ow = out_hw
    x1b, y1b, x2b, y2b = (boxes[:, i] for i in range(4))
    # degenerate boxes (zero padding slots) produce zero-area crops at (0,0);
    # callers mask them out
    bw = jnp.maximum(x2b - x1b, 1e-3)
    bh = jnp.maximum(y2b - y1b, 1e-3)

    # sample centers of a regular grid inside the box (align_corners=False)
    ys = (jnp.arange(oh, dtype=dtype) + 0.5) / oh  # (oh,)
    xs = (jnp.arange(ow, dtype=dtype) + 0.5) / ow
    sy = y1b[:, None] + ys[None, :] * bh[:, None] - 0.5  # (K, oh)
    sx = x1b[:, None] + xs[None, :] * bw[:, None] - 0.5  # (K, ow)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    sx = jnp.clip(sx, 0.0, w - 1.0)

    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = sy - y0
    fx = sx - x0
    return y0, y1, fy, x0, x1, fx


def crop_and_resize_batch(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    box_image_idx: jnp.ndarray,
    out_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Bilinearly sample K axis-aligned crops from a batch of images.

    Args:
      images: (B, H, W, C).
      boxes: (K, 4) xyxy in pixel coordinates (may be fractional/degenerate;
        clipped to the image).
      box_image_idx: (K,) int index into the batch for each box.
      out_hw: output (h, w).

    Returns: (K, h, w, C) crops.
    """
    y0, y1, fy, x0, x1, fx = _sample_grid(
        boxes, out_hw, images.shape[1:3], images.dtype
    )
    b = box_image_idx[:, None]  # (K, 1)

    # row gathers: (K, oh, W, C) contiguous-run reads straight from the batch
    top = images[b, y0]
    bot = images[b, y1]
    wy = fy[:, :, None, None]  # (K, oh, 1, 1)
    rows = top * (1 - wy) + bot * wy

    def per_crop(r, c0, c1, f):
        left = r[:, c0]  # (oh, ow, C)
        right = r[:, c1]
        fw = f[..., None]
        return left * (1 - fw) + right * fw

    return jax.vmap(per_crop)(rows, x0, x1, fx)


def crop_and_resize(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Bilinearly sample axis-aligned crops from one image.

    Args:
      image: (H, W, C).
      boxes: (K, 4) xyxy in pixel coordinates.
      out_hw: output (h, w).

    Returns:
      (K, h, w, C) crops.
    """
    idx = jnp.zeros((boxes.shape[0],), jnp.int32)
    return crop_and_resize_batch(image[None], boxes, idx, out_hw)
