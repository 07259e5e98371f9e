"""Margin-head math vs independent numpy transcriptions of the published
AdaFace/ArcFace/CosFace formulas."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from prpe_tpu.ops import margin


def setup(rng, B=8, E=16, C=10):
    kernel = rng.normal(size=(E, C)).astype(np.float32)
    emb = rng.normal(size=(B, E)).astype(np.float32)
    norms = np.linalg.norm(emb, axis=1, keepdims=True).astype(np.float32)
    emb = emb / norms
    labels = rng.integers(0, C, size=(B,))
    return kernel, emb, norms, labels


def np_cosine(kernel, emb, eps):
    kn = kernel / np.linalg.norm(kernel, axis=0, keepdims=True)
    return np.clip(emb @ kn, -1 + eps, 1 - eps)


def test_cosface_matches_formula(rng):
    kernel, emb, norms, labels = setup(rng)
    got = np.asarray(
        margin.cosface_logits(
            jnp.asarray(kernel), jnp.asarray(emb), jnp.asarray(labels), m=0.4, s=64.0
        )
    )
    cos = np_cosine(kernel, emb, 1e-4)
    m_hot = np.zeros_like(cos)
    m_hot[np.arange(len(labels)), labels] = 0.4
    want = (cos - m_hot) * 64.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_arcface_matches_formula(rng):
    kernel, emb, norms, labels = setup(rng)
    got = np.asarray(
        margin.arcface_logits(
            jnp.asarray(kernel), jnp.asarray(emb), jnp.asarray(labels), m=0.5, s=64.0
        )
    )
    cos = np_cosine(kernel, emb, 1e-4)
    m_hot = np.zeros_like(cos)
    m_hot[np.arange(len(labels)), labels] = 0.5
    want = np.cos(np.clip(np.arccos(cos) + m_hot, 1e-4, math.pi - 1e-4)) * 64.0
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_adaface_matches_formula(rng):
    kernel, emb, norms, labels = setup(rng)
    # non-unit norms to exercise the margin scaler
    norms = rng.uniform(5, 40, size=norms.shape).astype(np.float32)
    state = margin.MarginState.init()
    m, h, s, t_alpha, eps = 0.4, 0.333, 64.0, 0.01, 1e-3

    got, new_state = margin.adaface_logits(
        jnp.asarray(kernel), jnp.asarray(emb), jnp.asarray(norms),
        jnp.asarray(labels), state, m=m, h=h, s=s, t_alpha=t_alpha,
    )

    # --- independent numpy transcription of the AdaFace paper formula ------
    cos = np_cosine(kernel, emb, eps)
    safe = np.clip(norms, 0.001, 100)
    # Reference ordering (libs/head_adaface.py:87-96): EMA buffers update
    # FIRST, the margin scaler uses the updated statistics.
    bm0, bs0 = 20.0, 100.0  # initial EMA state
    bm = safe.mean() * t_alpha + (1 - t_alpha) * bm0
    bs = safe.std(ddof=1) * t_alpha + (1 - t_alpha) * bs0
    scaler = np.clip((safe - bm) / (bs + eps) * h, -1, 1)
    onehot = np.zeros_like(cos)
    onehot[np.arange(len(labels)), labels] = 1.0
    m_arc = onehot * (-m * scaler)
    theta = np.arccos(cos)
    cos2 = np.cos(np.clip(theta + m_arc, eps, math.pi - eps))
    cos3 = cos2 - onehot * (m + m * scaler)
    want = cos3 * s
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    # EMA update (unbiased std, torch .std() semantics)
    np.testing.assert_allclose(float(new_state.batch_mean), bm, rtol=1e-5)
    np.testing.assert_allclose(float(new_state.batch_std), bs, rtol=1e-4)


def test_adaface_margin_penalizes_true_class(rng):
    """With positive margin, the true-class logit must drop vs plain cosine."""
    kernel, emb, norms, labels = setup(rng)
    state = margin.MarginState.init()
    logits, _ = margin.adaface_logits(
        jnp.asarray(kernel), jnp.asarray(emb), jnp.asarray(norms),
        jnp.asarray(labels), state,
    )
    plain = np_cosine(kernel, emb, 1e-3) * 64.0
    got = np.asarray(logits)
    idx = np.arange(len(labels))
    assert np.all(got[idx, labels] <= plain[idx, labels] + 1e-4)
    # non-target logits unchanged
    mask = np.ones_like(got, bool)
    mask[idx, labels] = False
    np.testing.assert_allclose(got[mask], plain[mask], rtol=1e-4, atol=1e-4)


def test_kernel_init_unit_columns():
    k = margin.init_kernel(jax.random.key(0), 32, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(k), axis=0), np.ones(64), rtol=1e-5
    )


def test_adaface_grad_flows(rng):
    kernel, emb, norms, labels = setup(rng)
    state = margin.MarginState.init()

    def loss_fn(k, e):
        logits, _ = margin.adaface_logits(
            k, e, jnp.asarray(norms), jnp.asarray(labels), state
        )
        return jax.nn.logsumexp(logits, axis=-1).mean()

    g1, g2 = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(kernel), jnp.asarray(emb))
    assert np.isfinite(np.asarray(g1)).all() and np.abs(np.asarray(g1)).sum() > 0
    assert np.isfinite(np.asarray(g2)).all() and np.abs(np.asarray(g2)).sum() > 0
