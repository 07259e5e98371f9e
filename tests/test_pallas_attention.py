"""Fused MHSA kernel vs the einsum reference (Pallas interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prpe_tpu.ops.pallas.attention_kernel import (
    _attention_reference, _pallas_forward, mhsa_attention,
)


@pytest.mark.parametrize("variant", ["unrolled", "batched", "bh"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_einsum_reference(rng, dtype, variant):
    b, t, h, d = 2, 192, 12, 64
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), dtype)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), dtype)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), dtype)
    want = np.asarray(_attention_reference(q, k, v), np.float32)
    got = np.asarray(
        _pallas_forward(q, k, v, interpret=True, variant=variant), np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_mhsa_attention_grad_matches_reference(rng):
    """custom_vjp backward == jax.grad of the einsum reference."""
    b, t, h, d = 1, 16, 2, 8
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)

    def loss_fused(q, k, v):
        return (mhsa_attention(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (_attention_reference(q, k, v) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_mhsa_env_gate_identical_on_cpu(rng, monkeypatch):
    """PRPE_FUSED_ATTENTION=1 must not change ViT outputs on CPU (the
    kernel wrapper falls back to the einsum path off-TPU)."""
    from prpe_tpu.nn.vit import MHSA

    x = jnp.asarray(rng.normal(0, 1, (2, 24, 16)), jnp.float32)
    m = MHSA(hidden=16, heads=2)
    v = m.init(jax.random.key(0), x)
    base = m.apply(v, x)
    monkeypatch.setenv("PRPE_FUSED_ATTENTION", "1")
    fused = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


def test_mhsa_attention_cpu_fallback_matches(rng):
    """On a CPU backend mhsa_attention routes to the einsum path."""
    b, t, h, d = 2, 24, 3, 8
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, d)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mhsa_attention(q, k, v)),
        np.asarray(_attention_reference(q, k, v)), rtol=1e-6, atol=1e-6)
