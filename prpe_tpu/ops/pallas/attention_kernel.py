"""Pallas TPU kernel: fused multi-head self-attention for short sequences.

The ViT-B pose branch attends over only 192 tokens with head_dim 64
(nn/vit.py, HF `VitPoseForPoseEstimation` geometry). XLA lowers the naive
einsum chain as five separate fusions — QK^T dot, fp32 cast, softmax
reductions, bf16 cast, PV dot — each round-tripping the (B, H, T, T)
attention tensor (226 MB fp32 at the cascade's batch 128) through HBM plus
layout transposes. Profiled at ~13 ms of the cascade's 112 ms device time
against a ~2 ms matmul roofline.

This kernel runs ONE program per batch element with every head's Q/K/V
resident in VMEM (3 * 192 * 768 * 2B = 884 KB) and the (T, T) logits living
only in registers/VMEM scratch per head: QK^T (fp32 accumulate) -> row
softmax (fp32) -> P V (fp32 accumulate), heads unrolled. No flash-attention
streaming is needed — the whole problem fits on-core.

Training still uses the XLA path: `mhsa_attention` wraps the kernel in a
`jax.custom_vjp` whose backward recomputes attention with standard einsums,
so the fused forward is usable under `jax.grad` without a hand-written
backward kernel.

Numerics match the reference einsum path: logits and softmax in fp32,
output cast back to the input dtype (verified in
tests/test_pallas_attention.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one program per image: VMEM holds q/k/v (B=1 slice, T*H*D each) plus one
# (T, T) fp32 logits scratch. 192 tokens * 768 channels bf16 = 295 KB per
# operand; T <= 1024 keeps the fp32 logits block (4 MB) comfortable.
MAX_PALLAS_T = 1024


def _mhsa_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    # refs are (1, H, T, D) blocks; leading-dim indexing is full-block
    for h in range(heads):
        q = q_ref[0, h]  # (T, D)
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, T) fp32
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.dot(p.astype(q.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _attention_reference(q, k, v):
    """The einsum path (nn/vit.py MHSA semantics): fp32 logits + softmax."""
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _pallas_forward(q, k, v, *, interpret: bool = False):
    b, t, h, d = q.shape
    scale = d**-0.5
    # (B, H, T, D) layout: per-head (T, D) planes are full blocks, no
    # lane-dim slicing inside the kernel (Mosaic-friendly). The transposes
    # are ~0.9 MB/image of pure bandwidth.
    qf = q.transpose(0, 2, 1, 3)
    kf = k.transpose(0, 2, 1, 3)
    vf = v.transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, h, t, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mhsa_kernel, heads=h, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qf, kf, vf)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mhsa_attention(q, k, v, interpret: bool = False):
    """Fused softmax(Q K^T / sqrt(d)) V over (B, T, H, D) tensors.

    Falls back to the einsum path automatically on non-TPU backends (the
    kernel itself is TPU-only; `interpret=True` forces the Pallas
    interpreter for CPU tests).
    """
    if not interpret and jax.default_backend() != "tpu":
        return _attention_reference(q, k, v)
    if q.shape[1] > MAX_PALLAS_T:
        return _attention_reference(q, k, v)
    return _pallas_forward(q, k, v, interpret=interpret)


def _fwd(q, k, v, interpret):
    return mhsa_attention(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, g):
    """Standard attention backward, recomputed with XLA einsums — the
    training path pays one extra forward's worth of matmuls, matching what
    flash-style kernels do anyway."""
    q, k, v = res
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    pb = p.astype(q.dtype)

    dv = jnp.einsum("bhqk,bqhd->bkhd", pb, g)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v).astype(jnp.float32)
    ds = p * (dp - (dp * p).sum(-1, keepdims=True))
    ds = (ds * (d**-0.5)).astype(q.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q)
    return dq, dk, dv


mhsa_attention.defvjp(_fwd, _bwd)
