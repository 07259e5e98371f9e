"""Augmentation ops + pose eval hook tests (host-side, no jit)."""

import numpy as np

from prpe_tpu.data.augment import (
    box_blur, box_candidates, clahe, hsv_augment, median_blur, mixup,
    mosaic4, random_perspective, to_gray, warp_affine,
)
from prpe_tpu.eval.pose_hook import pose_eval_hook


class _FixedRng:
    """np.random.Generator stand-in returning scripted uniform draws."""

    def __init__(self, uniforms):
        self._u = list(uniforms)

    def uniform(self, lo, hi):
        frac = self._u.pop(0)
        return lo + (hi - lo) * frac


def test_random_perspective_identity():
    """Zero-magnitude params -> the affine is translate(0.5 w/h) @ center
    (exact identity): labels unchanged, image unchanged."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(40, 60, 3), dtype=np.uint8)
    labels = np.array([[0, 0.5, 0.5, 0.4, 0.3],
                       [1, 0.25, 0.3, 0.1, 0.15]], np.float32)
    out_img, out_lab = random_perspective(
        img, labels.copy(), rng, degrees=0, translate=0, scale=0, shear=0)
    np.testing.assert_array_equal(out_img, img)
    np.testing.assert_allclose(out_lab, labels, atol=1e-6)


def test_random_perspective_pure_translation_golden():
    """Scripted translate draw -> boxes shift by exactly the known offset
    (golden label geometry, reference dataset.py:352-375)."""
    img = np.zeros((100, 100, 3), np.uint8)
    img[40:60, 20:40] = 255
    labels = np.array([[0, 0.3, 0.5, 0.2, 0.2]], np.float32)
    # draws: angle(frac .5 -> 0), scale(.5 -> 1), shear x/y (.5 -> 0),
    # translate x (1.0 -> +0.1*w), translate y (0.5 -> 0)
    rng = _FixedRng([0.5, 0.5, 0.5, 0.5, 1.0, 0.5])
    out_img, out_lab = random_perspective(
        img, labels, rng, degrees=10, translate=0.1, scale=0.3, shear=5)
    np.testing.assert_allclose(
        out_lab[0], [0, 0.4, 0.5, 0.2, 0.2], atol=1e-6)
    # the white block moved right by 10 px
    assert out_img[50, 45, 0] == 255 and out_img[50, 25, 0] == 0


def test_random_perspective_scale_and_filter():
    """Upscale 2x about the center: the big box doubles; a sliver box at the
    border gets clipped away and must be filtered by box_candidates."""
    img = np.zeros((100, 100, 3), np.uint8)
    labels = np.array([
        [0, 0.5, 0.5, 0.3, 0.3],
        [1, 0.01, 0.5, 0.01, 0.3],  # hugs the left edge -> clipped off
    ], np.float32)
    # angle 0, scale frac 1.0 -> s = 1 + 1 = 2 with scale=1.0 param
    rng = _FixedRng([0.5, 1.0, 0.5, 0.5, 0.5, 0.5])
    _, out = random_perspective(
        img, labels, rng, degrees=0, translate=0.0, scale=1.0, shear=0)
    assert len(out) == 1 and out[0, 0] == 0
    np.testing.assert_allclose(out[0, 1:], [0.5, 0.5, 0.6, 0.6], atol=1e-6)


def test_random_perspective_rotation_corners():
    """90-degree rotation: a wide box becomes a tall box (corner-accurate,
    not just center-mapped)."""
    img = np.zeros((100, 100, 3), np.uint8)
    labels = np.array([[0, 0.5, 0.5, 0.4, 0.1]], np.float32)
    rng = _FixedRng([1.0, 0.5, 0.5, 0.5, 0.5, 0.5])  # angle frac 1 -> +90
    _, out = random_perspective(
        img, labels, rng, degrees=90, translate=0.0, scale=0.0, shear=0)
    np.testing.assert_allclose(out[0, 3], 0.1, atol=1e-6)  # w <- h
    np.testing.assert_allclose(out[0, 4], 0.4, atol=1e-6)  # h <- w


def test_warp_affine_identity_and_shift():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(20, 30, 3), dtype=np.uint8)
    np.testing.assert_array_equal(warp_affine(img, np.eye(3), 20, 30), img)
    m = np.eye(3)
    m[0, 2] = 5  # shift right 5 px
    out = warp_affine(img, m, 20, 30)
    np.testing.assert_array_equal(out[:, 5:], img[:, :-5])
    assert (out[:, :5] == 0).all()  # black border


def test_box_candidates_rules():
    before = np.array([[0, 0, 100, 100]] * 4, np.float32)
    after = np.array([
        [0, 0, 50, 50],     # fine
        [0, 0, 1.5, 50],    # too thin (w <= 2)
        [0, 0, 20, 10],     # area ratio 0.02 < 0.1
        [0, 0, 500, 4],     # aspect ratio 125 >= 100
    ], np.float32)
    np.testing.assert_array_equal(
        box_candidates(before, after), [True, False, False, False])


def test_box_blur_constant_invariant_and_smooths():
    img = np.full((16, 16, 3), 77, np.uint8)
    np.testing.assert_array_equal(box_blur(img, 5), img)
    spike = np.zeros((16, 16, 1), np.uint8)
    spike[8, 8] = 255
    out = box_blur(spike, 3)
    assert out[8, 8, 0] == round(255 / 9) and out[7, 7, 0] == round(255 / 9)
    assert out[8, 4, 0] == 0


def test_median_blur_removes_salt():
    img = np.full((16, 16, 3), 100, np.uint8)
    img[8, 8] = 255  # salt noise
    out = median_blur(img, 3)
    assert out[8, 8, 0] == 100
    assert out.shape == img.shape and out.dtype == np.uint8


def test_to_gray_luma():
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 0] = 200  # pure red
    out = to_gray(img)
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    assert abs(int(out[0, 0, 0]) - round(0.299 * 200)) <= 1


def test_clahe_flat_image_near_identity_and_contrast_boost():
    flat = np.full((64, 64, 3), 128, np.uint8)
    out = clahe(flat, clip_limit=2.0, tiles=2)
    assert np.abs(out.astype(int) - 128).max() <= 10  # near-identity
    # low-contrast gradient: a high clip limit barely clips, so the mapping
    # approaches plain per-tile equalization -> contrast stretches well
    # beyond the original 40-level range
    g = np.linspace(100, 140, 64, dtype=np.float32)
    img = np.repeat(np.tile(g[None, :], (64, 1))[..., None], 3, -1).astype(np.uint8)
    out = clahe(img, clip_limit=40.0, tiles=2)
    assert (out.astype(int).max() - out.astype(int).min()) > 100


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
    # cv2-exact uint8 HSV roundtrip: hue quantizes to 2 degrees, so
    # saturated pixels can move by a few counts (same as the reference's
    # cv2 path — this is intentional parity, not error)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 1.5


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
