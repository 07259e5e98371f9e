"""Golden tests for box ops against independent numpy brute-force math."""

import math

import jax.numpy as jnp
import numpy as np

from prpe_tpu.ops import boxes


def np_iou(b1, b2):
    x1 = max(b1[0], b2[0]); y1 = max(b1[1], b2[1])
    x2 = min(b1[2], b2[2]); y2 = min(b1[3], b2[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    return inter / (a1 + a2 - inter + 1e-7)


def test_cxcywh_roundtrip(rng):
    b = rng.uniform(0, 100, size=(17, 4)).astype(np.float32)
    b[:, 2:] = np.abs(b[:, 2:]) + 1.0
    out = boxes.xyxy_to_cxcywh(boxes.cxcywh_to_xyxy(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, rtol=1e-5, atol=1e-4)


def test_iou_matches_bruteforce(rng):
    n, m = 13, 9
    b1 = rng.uniform(0, 50, size=(n, 4)).astype(np.float32)
    b2 = rng.uniform(0, 50, size=(m, 4)).astype(np.float32)
    for b in (b1, b2):
        b[:, 2:] = b[:, :2] + np.abs(b[:, 2:]) + 1.0
    got = np.asarray(boxes.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = np.array([[np_iou(x, y) for y in b2] for x in b1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ciou_reference_semantics():
    """Exact-value check of the CIoU formula including eps placement
    (reference: training/yolopt/util.py:303-329)."""
    eps = 1e-7
    b1 = np.array([0.0, 0.0, 4.0, 4.0], np.float64)
    b2 = np.array([1.0, 1.0, 5.0, 6.0], np.float64)

    w1, h1 = b1[2] - b1[0], b1[3] - b1[1] + eps
    w2, h2 = b2[2] - b2[0], b2[3] - b2[1] + eps
    inter = max(0, min(b1[2], b2[2]) - max(b1[0], b2[0])) * max(
        0, min(b1[3], b2[3]) - max(b1[1], b2[1])
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = max(b1[2], b2[2]) - min(b1[0], b2[0])
    ch = max(b1[3], b2[3]) - min(b1[1], b2[1])
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2[0] + b2[2] - b1[0] - b1[2]) ** 2 + (b2[1] + b2[3] - b1[1] - b1[3]) ** 2) / 4
    v = 4 / math.pi**2 * (math.atan(w2 / h2) - math.atan(w1 / h1)) ** 2
    alpha = v / (v - iou + 1 + eps)
    want = iou - (rho2 / c2 + v * alpha)

    got = float(boxes.ciou(jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)))
    assert abs(got - want) < 1e-5


def test_ciou_perfect_match_is_one():
    b = jnp.asarray([2.0, 3.0, 10.0, 12.0])
    assert float(boxes.ciou(b, b)) > 0.999


def test_giou_diou_bounds(rng):
    b1 = rng.uniform(0, 50, size=(8, 4)).astype(np.float32)
    b2 = rng.uniform(0, 50, size=(8, 4)).astype(np.float32)
    for b in (b1, b2):
        b[:, 2:] = b[:, :2] + np.abs(b[:, 2:]) + 1.0
    for kind in ("giou", "diou", "ciou"):
        v = np.asarray(boxes.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2), kind=kind))
        assert np.all(v <= 1.0 + 1e-5) and np.all(v >= -1.0 - 1e-5)
