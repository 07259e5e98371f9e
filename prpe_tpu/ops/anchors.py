"""Anchor-free grid generation + DFL box decode.

Re-derivations of:
  * make_anchors (reference: training/yolopt/util.py:85-96)
  * DFL softmax-projection decode (reference: training/yolopt/util.py:692-700
    and training/yolopt/nets/nn.py:212-225)

Unlike the reference (which rebuilds anchors from live tensors every call),
anchors here are computed from *static* level shapes so they constant-fold
under jit.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def make_anchors(
    level_hw: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    offset: float = 0.5,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid-cell centers for each FPN level.

    Args:
      level_hw: [(H, W)] per level, e.g. [(80, 80), (40, 40), (20, 20)].
      strides: stride per level, e.g. [8, 16, 32].
      offset: cell-center offset (reference uses 0.5).

    Returns:
      anchor_points: (A, 2) in (x, y) grid units, row-major per level.
      stride_tensor: (A, 1).
    """
    pts, strs = [], []
    for (h, w), s in zip(level_hw, strides):
        sx = jnp.arange(w, dtype=dtype) + offset
        sy = jnp.arange(h, dtype=dtype) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        pts.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        strs.append(jnp.full((h * w, 1), float(s), dtype=dtype))
    return jnp.concatenate(pts, axis=0), jnp.concatenate(strs, axis=0)


def level_shapes(image_size: int, strides: Sequence[int] = (8, 16, 32)):
    """FPN level (H, W) for a square input of ``image_size``."""
    return [(image_size // s, image_size // s) for s in strides]


def dfl_decode(
    pred_dist: jnp.ndarray,
    anchor_points: jnp.ndarray,
    reg_max: int = 16,
) -> jnp.ndarray:
    """Distribution Focal Loss box decode.

    Softmax over ``reg_max`` bins per side, expectation against the bin-index
    projection, then lt/rb offsets from the anchor point
    (reference: training/yolopt/util.py:692-700).

    Args:
      pred_dist: (..., A, 4 * reg_max) raw distribution logits.
      anchor_points: (A, 2) grid-unit anchor centers.

    Returns:
      (..., A, 4) xyxy boxes in grid units.
    """
    shape = pred_dist.shape
    dist = pred_dist.reshape(*shape[:-1], 4, reg_max)
    prob = jax.nn.softmax(dist, axis=-1)
    proj = jnp.arange(reg_max, dtype=prob.dtype)
    dist = jnp.einsum("...k,k->...", prob, proj)  # (..., 4)
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    return jnp.concatenate([x1y1, x2y2], axis=-1)
