"""Augmentation ops + pose eval hook tests (host-side, no jit)."""

import numpy as np

from prpe_tpu.data.augment import hsv_augment, mixup, mosaic4
from prpe_tpu.eval.pose_hook import pose_eval_hook


def test_mosaic4_labels_inside(rng):
    samples = []
    for _ in range(4):
        img = rng.integers(0, 255, size=(40, 60, 3), dtype=np.uint8)
        labels = np.array([[0, 0.5, 0.5, 0.4, 0.4]], np.float32)
        samples.append((img, labels))
    img, labels = mosaic4(samples, 64, rng)
    assert img.shape == (64, 64, 3)
    assert len(labels) == 4
    # all centers within [0, 1]
    assert (labels[:, 1:3] >= 0).all() and (labels[:, 1:3] <= 1).all()


def test_mixup_blend(rng):
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.full((8, 8, 3), 200, np.uint8)
    la = np.array([[0, 0.5, 0.5, 0.1, 0.1]], np.float32)
    lb = np.array([[0, 0.2, 0.2, 0.1, 0.1]], np.float32)
    img, lab = mixup(a, la, b, lb, rng)
    assert 20 < img.mean() < 180  # blended
    assert len(lab) == 2


def test_hsv_preserves_shape_and_range(rng):
    img = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
    out = hsv_augment(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_hsv_identity_when_no_gain():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
    out = hsv_augment(img, rng, h_gain=0.0, s_gain=0.0, v_gain=0.0)
    # RGB->HSV->RGB roundtrip should be near-exact
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_pose_eval_hook_perfect_predictions(rng):
    """Predictions == gt (first instance) -> near-perfect AP."""
    hook = pose_eval_hook(image_size=64, keypoint_thresh=0.3)
    outputs = []
    for b in range(2):
        kpts = np.zeros((1, 2, 17, 3), np.float32)
        kpts[0, 0, :, 0] = rng.uniform(0.3, 0.7, 17)
        kpts[0, 0, :, 1] = rng.uniform(0.3, 0.7, 17)
        kpts[0, 0, :, 2] = 2
        batch = {
            "keypoints": kpts,
            "boxes": np.zeros((1, 2, 4), np.float32),
            "areas": np.full((1, 2), 900.0, np.float32),
            "mask": np.array([[True, False]]),
            "image_id": np.array([b]),
            "scale": np.array([1.0], np.float32),
            "pad": np.zeros((1, 2), np.float32),
        }
        coords = kpts[:, 0, :, :2]
        scores = np.full((1, 17), 0.9, np.float32)
        outputs.append(((coords, scores), batch))
    metrics = hook(outputs)
    assert metrics["kpt_AP"] > 0.99
