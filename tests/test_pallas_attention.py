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


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_ln_mhsa_matches_reference(rng, dtype):
    """The whole-half-block kernel (LN -> qkv -> attention -> proj ->
    residual) vs its XLA reference, interpret mode."""
    from prpe_tpu.ops.pallas.attention_kernel import (
        _ln_mhsa_reference, fused_ln_mhsa,
    )

    b, t, h, c = 2, 192, 12, 768
    x = jnp.asarray(rng.normal(0, 1, (b, t, c)), dtype)
    ls = jnp.asarray(rng.normal(1, 0.1, (c,)), jnp.float32)
    lb = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
    ws = [jnp.asarray(rng.normal(0, c ** -0.5, (c, c)), jnp.float32)
          for _ in range(4)]
    bs = [jnp.asarray(rng.normal(0, 0.02, (c,)), jnp.float32)
          for _ in range(4)]
    args = [x, ls, lb,
            ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3]]
    want = np.asarray(
        _ln_mhsa_reference(*args, heads=h, eps=1e-12), np.float32)
    got = np.asarray(
        fused_ln_mhsa(*args, heads=h, interpret=True), np.float32)
    tol = 2e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_vit_block_fused_mode_matches_module_path(rng, monkeypatch):
    """ViTBlock under PRPE_ATTN_MODE=pallas_lnfused (inference) must produce
    the same outputs and the SAME param tree as the module path."""
    from prpe_tpu.nn.vit import ViTBlock

    x = jnp.asarray(rng.normal(0, 1, (2, 48, 64)), jnp.float32)
    blk = ViTBlock(hidden=64, heads=4)

    monkeypatch.delenv("PRPE_ATTN_MODE", raising=False)
    v_module = blk.init(jax.random.key(0), x)
    want = np.asarray(blk.apply(v_module, x))

    monkeypatch.setenv("PRPE_ATTN_MODE", "pallas_lnfused")
    v_fused = blk.init(jax.random.key(0), x)
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape and np.allclose(a, b),
        v_module, v_fused))
    assert same, "fused path must declare an identical param tree"
    got = np.asarray(blk.apply(v_module, x))  # CPU -> XLA reference fallback
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
