"""Keypoint heatmap target generation and decoding.

Re-derivations of the reference pose math:
  * multi-instance adaptive-sigma Gaussian targets
    (reference: training/lightning/pose_estimation/module.py:298-380)
  * soft-argmax / UDP keypoint decode
    (reference: training/lightning/pose_estimation/module.py:237-296)

The reference generates targets with B x N Python loops; here the Gaussian is
built as a *separable outer product* (exp(-dx^2) x exp(-dy^2)) inside a
``lax.scan`` over padded instances, so peak memory is O(B*K*H*W) regardless of
instance count and everything jits with static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# COCO 17-keypoint OKS sigmas (public COCO eval constants; the reference
# carries the same table at training/lightning/pose_estimation/datamodule.py:37)
COCO_SIGMAS = jnp.array(
    [
        0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
        0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
    ],
    dtype=jnp.float32,
)

# left/right channel swap pairs for horizontal flip test
# (reference: training/lightning/pose_estimation/datamodule.py:25-35)
COCO_FLIP_PAIRS = ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16))

COCO_FLIP_PERM = jnp.array(
    [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15], dtype=jnp.int32
)


def generate_target_heatmaps(
    keypoints: jnp.ndarray,
    visibility: jnp.ndarray,
    areas: Optional[jnp.ndarray],
    *,
    heatmap_size: Tuple[int, int],
    sigma: float = 2.0,
    nominal_scale: float = 96.0,
    threshold: float = 0.005,
    normalize: str = "peak",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-instance Gaussian heatmap targets, max-combined across instances.

    ``normalize="peak"`` (default — the published top-down convention,
    SimpleBaselines/HRNet/ViTPose): raw ``exp(-d^2/2s^2)`` Gaussians, peak
    amplitude 1.0.

    ``normalize="sum"`` (reference parity): the reference divides each
    channel by its SUM and then zeroes values under 0.005
    (module.py:374-379). At the adaptive sigma of a typical person
    (sigma~4) that leaves a peak of ~1/(2*pi*sigma^2) ~= 0.01 — an MSE
    training signal ~1e4 weaker than the peak-1 convention. Fine when
    fine-tuning a PRETRAINED ViTPose (the reference's only use); training
    the pose branch from scratch against these targets was observed to
    shrink output amplitude toward zero without ever forming peaks
    (runs/r5 convergence attempts: val heatmap MSE 1000x the all-zeros
    baseline after 2 epochs while argmax-decoded pck fell). Reference
    quirk #4, reproduced (as an option) then corrected (as the default).

    Args:
      keypoints: (B, N, K, 2) normalized [0, 1] (x, y) coordinates, padded to
        a static instance count N.
      visibility: (B, N, K) COCO visibility flags (0/1/2); padded slots 0.
      areas: (B, N) instance areas for adaptive sigma, or None.
      heatmap_size: (H, W).
      sigma: base Gaussian sigma (pixels in heatmap space).
      nominal_scale: sqrt-area that maps to sigma exactly (reference uses 96).
      threshold: post-normalization noise floor (reference uses 0.005;
        applied only under ``normalize="sum"``).

    Returns:
      heatmaps: (B, K, H, W) target heatmaps.
      weights: (B, K) — 1.0 where any instance has vis==2, else 0.5 where any
        instance with >=1 visible keypoint exists, else 0 (exact reference
        semantics including its vis==0 -> 0.5 quirk at module.py:369-372).
    """
    bsz, n, k, _ = keypoints.shape
    h, w = heatmap_size
    dtype = keypoints.dtype

    xs = jnp.arange(w, dtype=dtype)
    ys = jnp.arange(h, dtype=dtype)

    mu = keypoints * jnp.array([w, h], dtype=dtype) - 0.5  # (B, N, K, 2)

    if areas is not None:
        scale = jnp.sqrt(jnp.maximum(areas, 0.0))
        adaptive_sigma = sigma * jnp.clip(scale / nominal_scale, 0.5, 2.0)  # (B, N)
    else:
        adaptive_sigma = jnp.full((bsz, n), sigma, dtype=dtype)

    valid_kpt = visibility > 0  # (B, N, K)
    inst_valid = valid_kpt.any(axis=-1)  # (B, N)

    def step(carry, inp):
        heat, wacc = carry
        mu_n, sig_n, visn, instn = inp  # (B,K,2), (B,), (B,K), (B,)
        inv = 1.0 / (2.0 * sig_n[:, None, None] ** 2)  # (B,1,1)
        # separable Gaussian: (B,K,H) x (B,K,W)
        gy = jnp.exp(-((ys[None, None, :] - mu_n[..., 1:2]) ** 2) * inv)
        gx = jnp.exp(-((xs[None, None, :] - mu_n[..., 0:1]) ** 2) * inv)
        mask = ((visn > 0) & instn[:, None]).astype(dtype)  # (B, K)
        g = jnp.einsum("bkh,bkw->bkhw", gy, gx) * mask[..., None, None]
        heat = jnp.maximum(heat, g)
        wn = jnp.where(visn == 2, 1.0, 0.5).astype(dtype) * instn[:, None].astype(dtype)
        wacc = jnp.maximum(wacc, wn)
        return (heat, wacc), None

    heat0 = jnp.zeros((bsz, k, h, w), dtype=dtype)
    w0 = jnp.zeros((bsz, k), dtype=dtype)
    (heatmaps, weights), _ = jax.lax.scan(
        step,
        (heat0, w0),
        (
            mu.transpose(1, 0, 2, 3),
            adaptive_sigma.T,
            visibility.transpose(1, 0, 2),
            inst_valid.T,
        ),
    )

    if normalize == "sum":
        heatmaps = heatmaps / (heatmaps.sum(axis=(2, 3), keepdims=True) + 1e-8)
        heatmaps = jnp.where(heatmaps > threshold, heatmaps, 0.0)
    elif normalize != "peak":
        raise ValueError(normalize)
    return heatmaps, weights


def decode_heatmaps(
    heatmaps: jnp.ndarray,
    boxes: Optional[jnp.ndarray] = None,
    *,
    nominal_scale: float = 96.0,
    method: str = "argmax",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keypoint decode from raw predicted heatmaps.

    ``method="argmax"`` (default — the CORRECTED decode): hard argmax plus
    the classic quarter-pixel shift toward the higher neighbor. Amplitude-
    invariant: an MSE-trained heatmap (Gaussian peak ~1.0 on ~0 background)
    decodes to its peak regardless of its dynamic range.

    ``method="soft"`` (reference parity + differentiable, used by the OKS
    loss term): softmax expectation over the FULL map, transcribing the
    reference's `_get_keypoints_from_heatmaps`
    (pose_estimation/module.py:237-296). Reference quirk, reproduced then
    corrected: softmax over H*W cells of a unit-amplitude heatmap is nearly
    uniform (exp(1) vs 3071*exp(0) at 64x48), so the expectation collapses
    toward the image CENTER however well the heatmaps fit — observed at full
    scale as pose pck_px frozen at ~0.06 while heatmap MSE fell to 1e-4
    (runs/r5_round_robin_convergence first attempt). Eval/serving therefore
    default to "argmax".

    Args:
      heatmaps: (B, K, H, W) raw predicted heatmaps (logits).
      boxes: optional (B, 4) xyxy boxes for scale-aware score re-weighting.

    Returns:
      coords: (B, K, 2) normalized [0, 1] (x, y).
      scores: (B, K) max softmax probability (optionally scale-weighted) —
        the reference's score semantic under both methods.
    """
    b, k, h, w = heatmaps.shape
    flat = heatmaps.reshape(b, k, h * w)
    prob = jax.nn.softmax(flat, axis=-1)

    if method == "soft":
        xs = jnp.arange(w, dtype=heatmaps.dtype)
        ys = jnp.arange(h, dtype=heatmaps.dtype)
        probhw = prob.reshape(b, k, h, w)
        x_exp = jnp.einsum("bkhw,w->bk", probhw, xs) + 0.5
        y_exp = jnp.einsum("bkhw,h->bk", probhw, ys) + 0.5
    elif method == "argmax":
        idx = jnp.argmax(flat, axis=-1)
        iy = (idx // w).astype(jnp.float32)
        ix = (idx % w).astype(jnp.float32)

        def at(dx, dy):
            xx = jnp.clip(ix + dx, 0, w - 1)
            yy = jnp.clip(iy + dy, 0, h - 1)
            lin = (yy * w + xx).astype(jnp.int32)
            return jnp.take_along_axis(flat, lin[..., None], axis=-1)[..., 0]

        # quarter-pixel shift toward the larger horizontal/vertical neighbor
        x_exp = ix + 0.5 + 0.25 * jnp.sign(at(1, 0) - at(-1, 0))
        y_exp = iy + 0.5 + 0.25 * jnp.sign(at(0, 1) - at(0, -1))
    else:
        raise ValueError(method)
    coords = jnp.stack([x_exp / w, y_exp / h], axis=-1)

    scores = prob.max(axis=-1)
    if boxes is not None:
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        scale = jnp.sqrt(jnp.maximum(area, 0.0))
        scale_weight = jnp.clip(scale / nominal_scale, 0.5, 2.0)
        scores = scores * scale_weight[:, None]
    return coords, scores


def flip_heatmaps(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Horizontal-flip-test transform: mirror W and swap L/R channels
    (reference: training/lightning/pose_estimation/module.py:478-481)."""
    flipped = jnp.flip(heatmaps, axis=-1)
    return flipped[:, COCO_FLIP_PERM]
