"""ROI crop + host-side eval metric tests."""

import jax.numpy as jnp
import numpy as np

from prpe_tpu.eval import keypoint_eval, verification
from prpe_tpu.eval.map import evaluate_detections, match_detections
from prpe_tpu.ops.roi import crop_and_resize, crop_and_resize_batch


# --------------------------------------------------------------------------
# ROI
# --------------------------------------------------------------------------

def test_crop_identity():
    """Cropping the full image at the same resolution is (nearly) identity."""
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    box = np.array([[0.0, 0.0, 16.0, 16.0]], np.float32)
    out = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(box), (16, 16)))
    np.testing.assert_allclose(out[0], img, atol=1e-5)


def test_crop_subregion_constant():
    img = np.zeros((32, 32, 1), np.float32)
    img[8:16, 8:16] = 1.0
    box = np.array([[8.0, 8.0, 16.0, 16.0]], np.float32)
    out = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(box), (4, 4)))
    np.testing.assert_allclose(out[0], 1.0, atol=1e-4)


def test_crop_batch_indexing():
    imgs = np.stack([np.full((8, 8, 1), i, np.float32) for i in range(3)])
    boxes = np.array([[0, 0, 8, 8]] * 3, np.float32)
    idx = np.array([2, 0, 1])
    out = np.asarray(crop_and_resize_batch(jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(idx), (2, 2)))
    np.testing.assert_allclose(out[:, 0, 0, 0], [2, 0, 1])


def test_crop_bf16_close_to_fp32():
    """bf16 serving path: interpolation weights quantize to ~2^-8, so bf16
    crops must stay within bf16 resolution of the fp32 crop (advisor
    finding: the golden bilinear test only covered fp32)."""
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    boxes = np.array([[3.2, 7.9, 45.5, 60.1], [10.0, 0.0, 64.0, 31.7]],
                     np.float32)
    idx = np.array([0, 1])
    ref = np.asarray(crop_and_resize_batch(
        jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(idx), (112, 112)))
    out = np.asarray(crop_and_resize_batch(
        jnp.asarray(img, jnp.bfloat16), jnp.asarray(boxes), jnp.asarray(idx),
        (112, 112))).astype(np.float32)
    # pixel values in [0,1]: bf16 has 8 mantissa bits -> ~2^-8 quantization,
    # two chained contractions roughly double it
    assert np.abs(out - ref).max() < 2.5 / 256


# --------------------------------------------------------------------------
# detection mAP
# --------------------------------------------------------------------------

def test_perfect_detections_map_one():
    gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    cls = np.zeros(2)
    per_image = [(gt.copy(), np.array([0.9, 0.8]), cls, gt, cls)]
    m = evaluate_detections(per_image)
    assert m["mAP50"] > 0.99
    assert m["mAP50-95"] > 0.99


def test_false_positive_lowers_precision():
    gt = np.array([[0, 0, 10, 10]], np.float32)
    det = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    per_image = [(det, np.array([0.9, 0.8]), np.zeros(2), gt, np.zeros(1))]
    m = evaluate_detections(per_image)
    assert m["mAP50"] > 0.9  # TP ranked first -> AP still high
    good = evaluate_detections([(gt, np.array([0.9]), np.zeros(1), gt, np.zeros(1))])
    assert m["precision"] <= good["precision"] + 1e-6


def test_match_unique_per_gt():
    gt = np.array([[0, 0, 10, 10]], np.float32)
    det = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    tp = match_detections(det, np.zeros(2), gt, np.zeros(1))
    # only one detection may match the single gt
    assert tp[:, 0].sum() == 1


# --------------------------------------------------------------------------
# keypoint OKS AP
# --------------------------------------------------------------------------

def make_kpt(xy, v=2):
    k = np.zeros((17, 3), np.float32)
    k[:, 0] = xy[:, 0]
    k[:, 1] = xy[:, 1]
    k[:, 2] = v
    return k


def test_keypoint_eval_perfect():
    rng = np.random.default_rng(0)
    anns, preds = [], []
    for img in range(3):
        xy = rng.uniform(100, 300, size=(17, 2)).astype(np.float32)
        k = make_kpt(xy)
        anns.append({"image_id": img, "keypoints": k.reshape(-1).tolist(),
                     "area": 150.0**2, "num_keypoints": 17})
        preds.append({"image_id": img, "keypoints": k.reshape(-1).tolist(),
                      "score": 0.9})
    m = keypoint_eval.evaluate_keypoints(preds, anns)
    assert m["AP"] > 0.99 and m["AR"] > 0.99
    assert m["AP50"] > 0.99 and m["AP75"] > 0.99


def test_pose_eval_hook_perfect_predictions():
    """End-to-end hook check: eval-step outputs that equal the ground truth
    (normalized letterbox-frame coords) must come back as kpt_AP ~ 1 — pins
    the coordinate un-mapping in prpe_tpu/eval/pose_hook.py."""
    from prpe_tpu.eval.pose_hook import pose_eval_hook

    rng = np.random.default_rng(0)
    K, B = 17, 3
    coords = rng.uniform(0.2, 0.8, (B, K, 2)).astype(np.float32)
    scores = np.full((B, K), 0.9, np.float32)
    kpts = np.concatenate(
        [coords[:, None], np.full((B, 1, K, 1), 2.0, np.float32)], axis=-1)
    batch = {
        "image_id": np.arange(B),
        "scale": np.full(B, 0.5, np.float32),        # letterbox downscale
        "pad": np.tile(np.array([[16.0, 0.0]], np.float32), (B, 1)),
        "boxes": np.tile(np.array([[[64, 64, 576, 576]]], np.float32),
                         (B, 1, 1)),
        "keypoints": kpts,
        "areas": np.full((B, 1), 512.0 * 512.0, np.float32),
        "mask": np.ones((B, 1), bool),
    }
    m = pose_eval_hook(640)([((coords, scores), batch)])
    assert m["kpt_AP"] > 0.99 and m["kpt_AP50"] > 0.99

    # and shifted predictions must NOT score
    bad = pose_eval_hook(640)([((coords + 0.4, scores), batch)])
    assert bad["kpt_AP"] < 0.05


def test_keypoint_eval_bad_predictions():
    rng = np.random.default_rng(0)
    anns, preds = [], []
    for img in range(3):
        xy = rng.uniform(100, 200, size=(17, 2)).astype(np.float32)
        anns.append({"image_id": img, "keypoints": make_kpt(xy).reshape(-1).tolist(),
                     "area": 50.0**2, "num_keypoints": 17})
        preds.append({"image_id": img,
                      "keypoints": make_kpt(xy + 500).reshape(-1).tolist(),
                      "score": 0.9})
    m = keypoint_eval.evaluate_keypoints(preds, anns)
    assert m["AP"] < 0.05


def test_oks_identity():
    xy = np.tile(np.array([[100.0, 100.0]]), (17, 1)).astype(np.float32)
    k = make_kpt(xy)
    assert keypoint_eval.compute_oks(k, k, 100.0) > 0.999


# --------------------------------------------------------------------------
# verification
# --------------------------------------------------------------------------

def test_verification_separable(rng):
    d = 64
    base = rng.normal(size=(100, d))
    same_b = base + rng.normal(0, 0.05, size=base.shape)
    diff_b = rng.normal(size=(100, d))
    emb_a = np.concatenate([base, base])
    emb_b = np.concatenate([same_b, diff_b])
    same = np.concatenate([np.ones(100, bool), np.zeros(100, bool)])
    perm = rng.permutation(200)
    m = verification.verification_accuracy(emb_a[perm], emb_b[perm], same[perm])
    assert m["accuracy"] > 0.95


def test_crop_matches_naive_bilinear():
    """Matmul-formulated crop == per-pixel numpy bilinear sampling."""
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(2, 24, 20, 3)).astype(np.float32)
    boxes = np.array([[2.3, 4.1, 17.8, 21.2], [0.0, 0.0, 5.5, 7.25]], np.float32)
    idx = np.array([1, 0])
    oh, ow = 6, 5
    out = np.asarray(crop_and_resize_batch(
        jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(idx), (oh, ow)))

    h, w = img.shape[1:3]
    want = np.zeros((2, oh, ow, 3), np.float32)
    for k in range(2):
        x1, y1, x2, y2 = boxes[k]
        bw, bh = max(x2 - x1, 1e-3), max(y2 - y1, 1e-3)
        src = img[idx[k]]
        for i in range(oh):
            for j in range(ow):
                sy = np.clip(y1 + (i + 0.5) / oh * bh - 0.5, 0.0, h - 1.0)
                sx = np.clip(x1 + (j + 0.5) / ow * bw - 0.5, 0.0, w - 1.0)
                y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                fy, fx = sy - y0, sx - x0
                top = src[y0, x0] * (1 - fx) + src[y0, x1i] * fx
                bot = src[y1i, x0] * (1 - fx) + src[y1i, x1i] * fx
                want[k, i, j] = top * (1 - fy) + bot * fy
    np.testing.assert_allclose(out, want, atol=1e-4)
