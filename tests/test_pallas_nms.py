"""Pallas NMS kernel (interpret mode on CPU) vs the lax reference path."""

import jax.numpy as jnp
import numpy as np
import pytest

from prpe_tpu.ops.nms import greedy_suppression_mask
from prpe_tpu.ops.boxes import pairwise_iou
from prpe_tpu.ops.pallas.nms_kernel import pallas_greedy_nms


def test_pallas_nms_matches_lax(rng):
    b, k = 2, 64
    centers = rng.uniform(50, 550, size=(b, 8, 2))
    idx = rng.integers(0, 8, size=(b, k))
    cxy = np.take_along_axis(centers, idx[..., None], 1) + rng.normal(0, 8, (b, k, 2))
    wh = rng.uniform(20, 80, size=(b, k, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.uniform(size=(b, k)).astype(np.float32))[:, ::-1]
    valid = scores > 0.3

    got = np.asarray(
        pallas_greedy_nms(jnp.asarray(boxes), jnp.asarray(valid),
                          iou_threshold=0.5, interpret=True)
    )
    for i in range(b):
        iou = pairwise_iou(jnp.asarray(boxes[i]), jnp.asarray(boxes[i]))
        want = np.asarray(
            greedy_suppression_mask(iou, jnp.asarray(valid[i]), 0.5)
        )
        np.testing.assert_array_equal(got[i], want)


def test_pallas_nms_tiled_large_k(rng):
    """K > _ROW_TILE exercises the row-tiled suppress-matrix construction."""
    b, k = 1, 640  # deliberately NOT a multiple of the 256-row tile
    cxy = rng.uniform(40, 600, size=(b, k, 2))
    wh = rng.uniform(10, 120, size=(b, k, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.uniform(size=(b, k)).astype(np.float32))[:, ::-1]
    valid = scores > 0.25

    got = np.asarray(
        pallas_greedy_nms(jnp.asarray(boxes), jnp.asarray(valid),
                          iou_threshold=0.65, interpret=True)
    )
    iou = pairwise_iou(jnp.asarray(boxes[0]), jnp.asarray(boxes[0]))
    want = np.asarray(greedy_suppression_mask(iou, jnp.asarray(valid[0]), 0.65))
    np.testing.assert_array_equal(got[0], want)
