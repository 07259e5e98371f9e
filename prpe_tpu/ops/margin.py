"""Adaptive-margin softmax heads (AdaFace / ArcFace / CosFace), functional.

Re-derivation of the reference heads (reference: libs/head_adaface.py:45-180).
The torch version mutates EMA buffers in-place inside ``forward``; here the
EMA statistics are explicit state threaded through the call — the JAX-native
shape for "buffers" — so the head is a pure function usable under jit, grad
and sharding. The 512 x num_classes kernel is the one genuinely large matmul
in the face branch; under a ``model`` mesh axis its class dimension shards and
XLA turns the row-max/log-sum-exp of the downstream cross-entropy into ICI
collectives automatically.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class MarginState(NamedTuple):
    """EMA of embedding-norm statistics
    (reference: libs/head_adaface.py:67-69,87-91)."""

    batch_mean: jnp.ndarray  # scalar
    batch_std: jnp.ndarray  # scalar

    @staticmethod
    def init(dtype=jnp.float32) -> "MarginState":
        return MarginState(
            batch_mean=jnp.asarray(20.0, dtype), batch_std=jnp.asarray(100.0, dtype)
        )


def normalized_cosine(kernel: jnp.ndarray, embeddings: jnp.ndarray,
                      eps: Optional[float] = None) -> jnp.ndarray:
    """Cosine similarity of (B, E) embeddings vs (E, C) class prototypes.

    ``eps=None`` returns the raw cosine — the reference's validation_step
    applies no clamp (face_recognition/module.py:136-140), and clipping at
    1-1e-3 can tie near-duplicate prototypes at argmax time. Margin heads
    pass ``eps>0`` to clip into arccos's open domain.
    """
    kernel_norm = kernel / jnp.linalg.norm(kernel, axis=0, keepdims=True)
    # Full-f32 matmul: TPU default matmul precision truncates mantissas, and
    # cosine margins are sensitive near the clip boundary (parity with the
    # reference's fp32 torch linear, libs/head_adaface.py:98).
    cosine = jnp.matmul(embeddings, kernel_norm, precision=jax.lax.Precision.HIGHEST)
    if eps is None:
        return cosine
    return jnp.clip(cosine, -1.0 + eps, 1.0 - eps)


# internal margin-head path (clip required before arccos)
_normalized_cosine = normalized_cosine


def adaface_logits(
    kernel: jnp.ndarray,
    embeddings: jnp.ndarray,
    norms: jnp.ndarray,
    labels: jnp.ndarray,
    state: MarginState,
    *,
    m: float = 0.4,
    h: float = 0.333,
    s: float = 64.0,
    t_alpha: float = 0.01,
    eps: float = 1e-3,
    update_stats: bool = True,
) -> Tuple[jnp.ndarray, MarginState]:
    """AdaFace margin logits (reference: libs/head_adaface.py:77-120).

    Args:
      kernel: (E, C) class prototype matrix (unnormalized).
      embeddings: (B, E) L2-normalized embeddings.
      norms: (B, 1) pre-normalization embedding norms.
      labels: (B,) int class ids.
      state: EMA norm statistics.

    Returns:
      (B, C) scaled logits, new state.
    """
    num_classes = kernel.shape[1]
    cosine = _normalized_cosine(kernel, embeddings, eps)

    safe_norms = jax.lax.stop_gradient(jnp.clip(norms, 0.001, 100.0))

    mean = safe_norms.mean()
    std = safe_norms.std(ddof=1)  # torch .std() is unbiased
    if update_stats:
        new_state = MarginState(
            batch_mean=mean * t_alpha + (1.0 - t_alpha) * state.batch_mean,
            batch_std=std * t_alpha + (1.0 - t_alpha) * state.batch_std,
        )
    else:
        new_state = state

    # Reference updates the EMA buffers first and computes the margin scaler
    # from the *updated* statistics in the same forward
    # (libs/head_adaface.py:87-96) — use new_state, not the stale state.
    margin_scaler = (safe_norms - new_state.batch_mean) / (new_state.batch_std + eps)
    margin_scaler = jnp.clip(margin_scaler * h, -1.0, 1.0)  # (B, 1)

    one_hot = jax.nn.one_hot(labels, num_classes, dtype=cosine.dtype)

    # g_angular: class-dependent additive angle
    g_angular = -m * margin_scaler  # (B, 1)
    m_arc = one_hot * g_angular
    theta = jnp.arccos(cosine)
    theta_m = jnp.clip(theta + m_arc, eps, math.pi - eps)
    cosine = jnp.cos(theta_m)

    # g_additive: class-dependent cosine margin
    g_add = m + m * margin_scaler  # (B, 1)
    cosine = cosine - one_hot * g_add

    return cosine * s, new_state


def arcface_logits(
    kernel: jnp.ndarray,
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    m: float = 0.5,
    s: float = 64.0,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """ArcFace (reference: libs/head_adaface.py:152-179)."""
    num_classes = kernel.shape[1]
    cosine = _normalized_cosine(kernel, embeddings, eps)
    m_hot = jax.nn.one_hot(labels, num_classes, dtype=cosine.dtype) * m
    theta = jnp.arccos(cosine)
    theta_m = jnp.clip(theta + m_hot, eps, math.pi - eps)
    return jnp.cos(theta_m) * s


def cosface_logits(
    kernel: jnp.ndarray,
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    m: float = 0.4,
    s: float = 64.0,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """CosFace (reference: libs/head_adaface.py:122-149)."""
    num_classes = kernel.shape[1]
    cosine = _normalized_cosine(kernel, embeddings, eps)
    m_hot = jax.nn.one_hot(labels, num_classes, dtype=cosine.dtype) * m
    return (cosine - m_hot) * s


def init_kernel(key: jax.Array, embedding_size: int, num_classes: int) -> jnp.ndarray:
    """Kernel init matching the reference: uniform(-1, 1) renormalized to
    row-l2-norm 1e-5 then scaled by 1e5 (libs/head_adaface.py:59) — i.e. each
    embedding-row ends up l2-normalized along... the renorm is over dim 1 with
    maxnorm 1e-5, effectively normalizing rows to unit norm after the 1e5
    scale. We implement the net effect: rows of unit l2 norm."""
    k = jax.random.uniform(key, (embedding_size, num_classes), minval=-1.0, maxval=1.0)
    # torch renorm(2, 1, 1e-5) operates over dim-1 slices, i.e. columns of
    # (E, C): each class prototype is normalized.
    norms = jnp.linalg.norm(k, axis=0, keepdims=True)
    return k / jnp.maximum(norms, 1e-12)
