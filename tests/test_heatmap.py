"""Heatmap target-gen / decode vs a naive numpy loop implementation."""

import jax.numpy as jnp
import numpy as np

from prpe_tpu.ops import heatmap


def naive_targets(keypoints, visibility, areas, hw, sigma=2.0):
    """Direct per-pixel loop transcription of the published adaptive-sigma
    multi-instance Gaussian target algorithm."""
    B, N, K, _ = keypoints.shape
    H, W = hw
    heat = np.zeros((B, K, H, W), np.float64)
    weights = np.zeros((B, K), np.float64)
    ys, xs = np.mgrid[0:H, 0:W]
    kp = keypoints.copy()
    kp[..., 0] = kp[..., 0] * W - 0.5
    kp[..., 1] = kp[..., 1] * H - 0.5
    sig = sigma * np.clip(np.sqrt(areas) / 96.0, 0.5, 2.0)
    for b in range(B):
        for n in range(N):
            if not (visibility[b, n] > 0).any():
                continue
            for k in range(K):
                g = np.exp(
                    -((xs - kp[b, n, k, 0]) ** 2 + (ys - kp[b, n, k, 1]) ** 2)
                    / (2 * sig[b, n] ** 2)
                ) * (visibility[b, n, k] > 0)
                heat[b, k] = np.maximum(heat[b, k], g)
            weights[b] = np.maximum(
                weights[b], np.where(visibility[b, n] == 2, 1.0, 0.5)
            )
    heat = heat / (heat.sum(axis=(2, 3), keepdims=True) + 1e-8)
    heat = np.where(heat > 0.005, heat, 0.0)
    return heat, weights


def make_batch(rng, B=2, N=3, K=17):
    kp = rng.uniform(0.1, 0.9, size=(B, N, K, 2)).astype(np.float32)
    vis = rng.integers(0, 3, size=(B, N, K)).astype(np.float32)
    vis[0, 2] = 0.0  # one fully-invisible instance
    areas = rng.uniform(500, 20000, size=(B, N)).astype(np.float32)
    return kp, vis, areas


def test_targets_match_naive(rng):
    """normalize="sum" reproduces the reference's sum-normalize + 0.005
    threshold exactly (the naive loop transcribes module.py:298-380)."""
    kp, vis, areas = make_batch(rng)
    got_h, got_w = heatmap.generate_target_heatmaps(
        jnp.asarray(kp), jnp.asarray(vis), jnp.asarray(areas),
        heatmap_size=(64, 48), sigma=2.0, normalize="sum",
    )
    want_h, want_w = naive_targets(kp, vis, areas, (64, 48))
    np.testing.assert_allclose(np.asarray(got_h), want_h, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_w), want_w)


def test_targets_peak_normalization(rng):
    """The default (peak) targets are the same Gaussians WITHOUT the
    reference's sum-normalization: amplitude 1.0 at each visible keypoint
    (the published top-down convention — see generate_target_heatmaps
    docstring for why the sum-normalized variant starves from-scratch
    training)."""
    kp, vis, areas = make_batch(rng)
    got_h, got_w = heatmap.generate_target_heatmaps(
        jnp.asarray(kp), jnp.asarray(vis), jnp.asarray(areas),
        heatmap_size=(64, 48), sigma=2.0,
    )
    got_h = np.asarray(got_h)
    assert abs(got_h.max() - 1.0) < 1e-3  # peak amplitude ~1 at a keypoint
    # identical shape to the naive (un-normalized) Gaussians
    B, N, K, _ = kp.shape
    H, W = 64, 48
    ys, xs = np.mgrid[0:H, 0:W]
    kpx = kp.copy()
    kpx[..., 0] = kpx[..., 0] * W - 0.5
    kpx[..., 1] = kpx[..., 1] * H - 0.5
    sig = 2.0 * np.clip(np.sqrt(areas) / 96.0, 0.5, 2.0)
    want = np.zeros((B, K, H, W))
    for b in range(B):
        for n in range(N):
            if not (vis[b, n] > 0).any():
                continue
            for k in range(K):
                g = np.exp(-((xs - kpx[b, n, k, 0]) ** 2
                             + (ys - kpx[b, n, k, 1]) ** 2)
                           / (2 * sig[b, n] ** 2)) * (vis[b, n, k] > 0)
                want[b, k] = np.maximum(want[b, k], g)
    np.testing.assert_allclose(got_h, want, rtol=1e-4, atol=1e-6)


def test_decode_recovers_peak(rng):
    """A sharp Gaussian target decodes back to its own center."""
    kp = np.zeros((1, 1, 17, 2), np.float32)
    kp[..., 0] = np.linspace(0.2, 0.8, 17)
    kp[..., 1] = np.linspace(0.3, 0.7, 17)
    vis = np.full((1, 1, 17), 2.0, np.float32)
    heat, _ = heatmap.generate_target_heatmaps(
        jnp.asarray(kp), jnp.asarray(vis), None, heatmap_size=(64, 48), sigma=1.5
    )
    # the soft (reference-parity) decode treats input as logits and needs
    # log-probabilities to be amplitude-calibrated
    logits = jnp.log(heat + 1e-12) * 1.0
    coords, scores = heatmap.decode_heatmaps(logits, method="soft")
    # soft-argmax of a symmetric gaussian ~ its center (within a pixel)
    got = np.asarray(coords[0])
    np.testing.assert_allclose(got[:, 0], kp[0, 0, :, 0], atol=1.5 / 48)
    np.testing.assert_allclose(got[:, 1], kp[0, 0, :, 1], atol=1.5 / 64)
    assert np.all(np.asarray(scores) > 0)


def test_argmax_decode_is_amplitude_invariant(rng):
    """The default (argmax) decode recovers the peak from a RAW MSE-style
    target (Gaussian amplitude 1.0 on ~0 background) — exactly the case
    where the reference's softmax-expectation decode collapses toward the
    image center (pose_estimation/module.py:237-296 quirk; see
    ops/heatmap.py docstring)."""
    kp = np.zeros((1, 1, 17, 2), np.float32)
    kp[..., 0] = np.linspace(0.15, 0.85, 17)
    kp[..., 1] = np.linspace(0.25, 0.75, 17)
    vis = np.full((1, 1, 17), 2.0, np.float32)
    heat, _ = heatmap.generate_target_heatmaps(
        jnp.asarray(kp), jnp.asarray(vis), None, heatmap_size=(64, 48), sigma=1.5
    )
    got = np.asarray(heatmap.decode_heatmaps(heat)[0][0])
    np.testing.assert_allclose(got[:, 0], kp[0, 0, :, 0], atol=1.5 / 48)
    np.testing.assert_allclose(got[:, 1], kp[0, 0, :, 1], atol=1.5 / 64)

    # ... and the same decode is invariant to amplitude scaling
    got4 = np.asarray(heatmap.decode_heatmaps(heat * 0.25)[0][0])
    np.testing.assert_allclose(got4, got, atol=1e-6)

    # the soft decode on the raw map demonstrates the quirk: pulled to center
    soft = np.asarray(
        heatmap.decode_heatmaps(heat, method="soft")[0][0])
    assert np.abs(soft - 0.5).max() < 0.05


def test_decode_box_scale_weighting():
    h = jnp.zeros((2, 17, 64, 48))
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 500, 500]], jnp.float32)
    _, s = heatmap.decode_heatmaps(h, boxes)
    # small box -> 0.5x weight; big box -> 2x weight
    np.testing.assert_allclose(np.asarray(s[1] / s[0]), 4.0, rtol=1e-5)


def test_flip_heatmaps_involution(rng):
    h = jnp.asarray(rng.uniform(size=(2, 17, 8, 6)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(heatmap.flip_heatmaps(heatmap.flip_heatmaps(h))), np.asarray(h)
    )
