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


def _mhsa_kernel_batched(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """All heads in ONE batched dot_general pair per image: Mosaic emits the
    12 MXU contractions back-to-back (no per-head VPU interleave) and the
    softmax vectorizes across heads in a single (H*T, T) sweep."""
    q = q_ref[0]  # (H, T, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (H, T, T) fp32
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, T, D)
    o_ref[0] = o.astype(o_ref.dtype)


def _mhsa_kernel_bh(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (image, head) per program; grid dims marked PARALLEL so Mosaic
    double-buffers the tiny (T, D) blocks across the 1536-program grid."""
    q = q_ref[0, 0]  # (T, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0, 0] = jnp.dot(
        p.astype(q.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _mhsa_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    """Consumes the NATURAL (B, T, H*D) layout of the q/k/v Dense outputs —
    no HBM transposes at all (the (B,H,T,D) relayout around the other
    variants measured ~8 ms/step at the cascade shape, more than the kernel
    saves). Heads are gathered by 64-wide lane slices into a VMEM-local
    (H, T, D) stack, then contracted as one batched dot_general pair."""
    t, c = q_ref.shape[1], q_ref.shape[2]
    d = c // heads
    q = jnp.stack([q_ref[0, :, h * d:(h + 1) * d] for h in range(heads)])
    k = jnp.stack([k_ref[0, :, h * d:(h + 1) * d] for h in range(heads)])
    v = jnp.stack([v_ref[0, :, h * d:(h + 1) * d] for h in range(heads)])
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (H, T, T) fp32
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)  # (H, T, D)
    o_ref[0] = jnp.concatenate(list(o), axis=-1)


def _ln_mhsa_kernel(x_ref, g_ref, lb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                    wv_ref, bv_ref, wo_ref, bo_ref, o_ref,
                    *, heads: int, scale: float, eps: float):
    """Whole attention half-block per program: LayerNorm -> q/k/v projections
    -> multi-head attention -> output projection -> residual add, all in
    VMEM. One program per image; the four (C, C) weight blocks have a
    constant index_map so Mosaic keeps them resident across the whole grid
    (fetched from HBM once, not per image). Eliminates the per-block HBM
    round-trips of ln1(x), q, k, v and the attention output (~5 tensors x
    (B, 192, 768) each way) that the separate-dispatch path pays.

    VMEM at ViT-B geometry: 4 x 1.18 MB bf16 weights + (T, C) activations
    ~0.3 MB each + (H, T, T) fp32 logits 1.7 MB ~= 8 MB of 16."""
    ipb, t, c = x_ref.shape  # images per block, tokens, channels
    d = c // heads
    x = x_ref[...].reshape(ipb * t, c)  # (IPB*T, C) input dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[0].astype(jnp.float32) + lb_ref[0].astype(jnp.float32)
    xn = xn.astype(x.dtype)

    def dense(inp, w_ref, b_ref):
        y = jax.lax.dot_general(
            inp, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + b_ref[0].astype(jnp.float32)).astype(x.dtype)

    # projections at M = IPB*T — IPB > 1 keeps the MXU rows full (M=192
    # alone measured the kernel GEMMs slower than XLA's all-batch GEMMs,
    # a wash end-to-end)
    q = dense(xn, wq_ref, bq_ref)
    k = dense(xn, wk_ref, bk_ref)
    v = dense(xn, wv_ref, bv_ref)
    outs = []
    for i in range(ipb):  # attention per image: (T, T) logits stay small
        sl = slice(i * t, (i + 1) * t)
        qs = jnp.stack([q[sl, h * d:(h + 1) * d] for h in range(heads)])
        ks = jnp.stack([k[sl, h * d:(h + 1) * d] for h in range(heads)])
        vs = jnp.stack([v[sl, h * d:(h + 1) * d] for h in range(heads)])
        s = jax.lax.dot_general(
            qs, ks, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (H, T, T) fp32
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(x.dtype), vs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (H, T, D)
        outs.append(jnp.concatenate(list(o), axis=-1))  # (T, C)
    o = jnp.concatenate(outs, axis=0)  # (IPB*T, C)
    y = dense(o, wo_ref, bo_ref)
    o_ref[...] = (x + y).reshape(ipb, t, c)


def _ln_mhsa_reference(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                       heads: int, eps: float):
    """XLA path with the SAME semantics (fp32 LN stats + fp32 softmax) —
    the off-TPU fallback and the parity oracle for tests."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
          ).astype(x.dtype)
    b_, t, c = x.shape
    d = c // heads
    dt = x.dtype
    q = (xn @ wq.astype(dt) + bq.astype(dt)).reshape(b_, t, heads, d)
    k = (xn @ wk.astype(dt) + bk.astype(dt)).reshape(b_, t, heads, d)
    v = (xn @ wv.astype(dt) + bv.astype(dt)).reshape(b_, t, heads, d)
    o = _attention_reference(q, k, v).reshape(b_, t, c)
    return x + (o @ wo.astype(dt) + bo.astype(dt))


def fused_ln_mhsa(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                  *, heads: int, eps: float = 1e-12,
                  interpret: bool = False):
    """Inference-only fused pre-LN attention half-block:
    ``x + proj(attention(qkv(LN(x))))`` (nn/vit.py ViTBlock's first half).

    INFERENCE ONLY — no custom VJP; the training path keeps the separate
    LN/Dense/attention modules (ViTBlock gates on ``train``). Falls back to
    the XLA reference off-TPU. Weights arrive as the fp32 flax params and
    are cast to ``x.dtype`` here, outside the kernel, so VMEM holds the
    bf16 copies."""
    b, t, c = x.shape
    if (not interpret and jax.default_backend() != "tpu") or t > MAX_PALLAS_T:
        return _ln_mhsa_reference(x, ln_scale, ln_bias, wq, bq, wk, bk,
                                  wv, bv, wo, bo, heads, eps)
    dt = x.dtype
    row = lambda a: a.reshape(1, -1)
    # images per program: M = ipb*T keeps the in-kernel GEMM rows full
    # (ipb=1's M=192 GEMMs measured slower than XLA's all-batch GEMMs);
    # bounded by VMEM — 4 images of ViT-B geometry ~= 13 MB with weights
    ipb = next((n for n in (4, 2, 1) if b % n == 0), 1)
    spec_x = pl.BlockSpec((ipb, t, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    d = c // heads
    return pl.pallas_call(
        functools.partial(_ln_mhsa_kernel, heads=heads, scale=d ** -0.5,
                          eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, t, c), dt),
        grid=(b // ipb,),
        in_specs=[spec_x, spec_v, spec_v,
                  spec_w, spec_v, spec_w, spec_v, spec_w, spec_v,
                  spec_w, spec_v],
        out_specs=spec_x,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)),
    )(x, row(ln_scale), row(ln_bias),
      wq.astype(dt), row(bq), wk.astype(dt), row(bk), wv.astype(dt), row(bv),
      wo.astype(dt), row(bo))


def _attention_reference(q, k, v):
    """The einsum path (nn/vit.py MHSA semantics): fp32 logits + softmax."""
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _pallas_forward(q, k, v, *, interpret: bool = False, variant: str = "unrolled"):
    b, t, h, d = q.shape
    scale = d**-0.5
    if variant == "packed":
        # natural layout end-to-end: (B, T, H*D) in, (B, T, H*D) out
        c = h * d
        spec = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_mhsa_kernel_packed, heads=h, scale=scale),
            out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
            grid=(b,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)),
        )(q.reshape(b, t, c), k.reshape(b, t, c), v.reshape(b, t, c)
          ).reshape(b, t, h, d)
    # (B, H, T, D) layout: per-head (T, D) planes are full blocks, no
    # lane-dim slicing inside the kernel (Mosaic-friendly). The transposes
    # are ~0.9 MB/image of pure bandwidth.
    qf = q.transpose(0, 2, 1, 3)
    kf = k.transpose(0, 2, 1, 3)
    vf = v.transpose(0, 2, 1, 3)
    if variant == "bh":
        spec = pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_mhsa_kernel_bh, scale=scale),
            out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            grid=(b, h),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,
                                     pltpu.GridDimensionSemantics.PARALLEL)),
        )(qf, kf, vf)
        return out.transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, h, t, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = (functools.partial(_mhsa_kernel_batched, scale=scale)
            if variant == "batched"
            else functools.partial(_mhsa_kernel, heads=h, scale=scale))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,)),
    )(qf, kf, vf)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mhsa_attention(q, k, v, interpret: bool = False, variant: str = "batched"):
    """Fused softmax(Q K^T / sqrt(d)) V over (B, T, H, D) tensors.

    Falls back to the einsum path automatically on non-TPU backends (the
    kernel itself is TPU-only; `interpret=True` forces the Pallas
    interpreter for CPU tests). ``variant``: "batched" (default — all heads
    in one dot_general pair, see _mhsa_kernel_batched), "unrolled" (round-2
    per-head loop), "bh" (one program per (image, head)).
    """
    if not interpret and jax.default_backend() != "tpu":
        return _attention_reference(q, k, v)
    if q.shape[1] > MAX_PALLAS_T:
        return _attention_reference(q, k, v)
    return _pallas_forward(q, k, v, interpret=interpret, variant=variant)


def _fwd(q, k, v, interpret, variant):
    return mhsa_attention(q, k, v, interpret, variant), (q, k, v)


def _bwd(interpret, variant, res, g):
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
