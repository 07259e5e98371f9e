"""Fixed-shape on-device NMS vs an independent brute-force greedy NMS."""

import jax
import jax.numpy as jnp
import numpy as np

from prpe_tpu.ops import nms
from tests.test_boxes import np_iou


def greedy_nms_np(boxes, scores, iou_thr, conf_thr, max_det):
    """Plain-python exact greedy NMS (the published algorithm)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        if scores[i] <= conf_thr:
            continue
        if any(np_iou(boxes[i], boxes[j]) > iou_thr for j in keep):
            continue
        keep.append(i)
        if len(keep) >= max_det:
            break
    return keep


def make_candidates(rng, n=64, nc=1):
    # clustered boxes so suppression actually happens
    centers = rng.uniform(50, 550, size=(8, 2))
    idx = rng.integers(0, 8, size=n)
    cxy = centers[idx] + rng.normal(0, 6, size=(n, 2))
    wh = rng.uniform(20, 80, size=(n, 2))
    boxes = np.concatenate([cxy, wh], -1).astype(np.float32)  # cxcywh
    scores = rng.uniform(0, 1, size=(n, nc)).astype(np.float32)
    return boxes, scores


def test_nms_matches_bruteforce(rng):
    boxes_cw, scores = make_candidates(rng, n=96)
    outputs = jnp.asarray(np.concatenate([boxes_cw, scores], -1))[None]  # (1, N, 5)

    det = jax.jit(
        lambda o: nms.non_max_suppression(
            o, conf_threshold=0.05, iou_threshold=0.5, max_det=20, pre_nms_top_k=96
        )
    )(outputs)

    xyxy = np.concatenate(
        [boxes_cw[:, :2] - boxes_cw[:, 2:] / 2, boxes_cw[:, :2] + boxes_cw[:, 2:] / 2], -1
    )
    want = greedy_nms_np(xyxy, scores[:, 0], 0.5, 0.05, 20)

    n_valid = int(det.valid[0].sum())
    assert n_valid == len(want)
    got_boxes = np.asarray(det.boxes[0][:n_valid])
    want_boxes = xyxy[want]
    # same set, same score order
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-5, atol=1e-3)
    got_scores = np.asarray(det.scores[0][:n_valid])
    np.testing.assert_allclose(got_scores, scores[want, 0], rtol=1e-6)


def test_nms_conf_threshold_filters_everything(rng):
    boxes_cw, scores = make_candidates(rng, n=32)
    outputs = jnp.asarray(np.concatenate([boxes_cw, scores * 0.0001], -1))[None]
    det = nms.non_max_suppression(outputs, conf_threshold=0.5, max_det=10, pre_nms_top_k=32)
    assert int(det.valid.sum()) == 0
    assert det.boxes.shape == (1, 10, 4)


def test_nms_multiclass_class_offset(rng):
    """Two perfectly-overlapping boxes of different classes must both survive."""
    box = np.array([100.0, 100.0, 40.0, 40.0], np.float32)
    outputs = np.zeros((1, 2, 4 + 2), np.float32)
    outputs[0, 0, :4] = box
    outputs[0, 1, :4] = box
    outputs[0, 0, 4] = 0.9  # class 0
    outputs[0, 1, 5] = 0.8  # class 1
    det = nms.non_max_suppression(
        jnp.asarray(outputs), conf_threshold=0.1, iou_threshold=0.5, max_det=4,
        pre_nms_top_k=2,
    )
    assert int(det.valid.sum()) == 2
    assert set(np.asarray(det.classes[0][det.valid[0]])) == {0, 1}


def test_nms_batched_and_jit(rng):
    boxes_cw, scores = make_candidates(rng, n=48)
    outputs = np.stack(
        [np.concatenate([boxes_cw, scores], -1) for _ in range(3)]
    ).astype(np.float32)
    det = jax.jit(
        lambda o: nms.non_max_suppression(o, max_det=16, pre_nms_top_k=48)
    )(jnp.asarray(outputs))
    assert det.boxes.shape == (3, 16, 4)
    # identical inputs -> identical outputs across batch
    np.testing.assert_allclose(det.boxes[0], det.boxes[2])
