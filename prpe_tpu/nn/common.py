"""Shared NN building blocks (flax.linen, NHWC).

TPU-first conventions used across all models:
  * NHWC activations — XLA's native conv layout on TPU.
  * fp32 params, bf16 compute via the module `dtype` arg.
  * BatchNorm statistics reduce over the *global* batch under jit + batch
    sharding, which reproduces the reference's SyncBatchNorm for free
    (reference: training/yolopt/main.py:57-60).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def fast_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU: exact erf in fp32, tanh-approximate in bf16.

    The reference's torch ``nn.GELU``/HF ViT use the exact erf form. On bf16
    activations the tanh approximation's worst-case error (~3e-3 absolute)
    is below bf16's own quantization step (~8e-3 relative), while the erf
    lowering costs real VPU time: measured on a v5e (2026-08-19), one
    24576x3072 MLP activation is +0.78 ms with erf vs +0.04 ms with tanh —
    x12 blocks = 17% of the whole ViTPose-B forward. fp32 paths (the
    torch-porting parity tests) keep exact erf, so ported checkpoints
    reproduce reference numerics bit-for-bit there.
    """
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def inference_bn(bn: nn.BatchNorm, x: jnp.ndarray, train: bool) -> jnp.ndarray:
    """Apply ``bn``; in inference mode, as a dtype-preserving scale+bias.

    flax's eval-mode BatchNorm normalizes against the fp32 running stats,
    which XLA compiles as a separate fp32 fusion with retiling copies around
    every conv (bf16 and fp32 use different TPU tile shapes — measured ~1.4
    ms/step of pure layout copies in the 640^2 cascade). Precomputing the
    per-channel scale/bias in fp32 and applying them in the activation dtype
    keeps the whole conv+BN+act chain in ONE fusion — the trace-time
    equivalent of the reference's weight-level ``fuse_conv``
    (reference: training/yolopt/nets/nn.py:8-25).

    In train mode this is exactly ``bn(x)`` (batch-stats path untouched).
    """
    if train:
        return bn(x)
    _ = bn(x)  # declares params/stats; unused output is DCE'd by XLA
    v = bn.variables
    var = v["batch_stats"]["var"]
    mean = v["batch_stats"]["mean"]
    scale = jax.lax.rsqrt(var + bn.epsilon)
    if bn.use_scale:
        scale = scale * v["params"]["scale"]
    bias = -mean * scale
    if bn.use_bias:
        bias = bias + v["params"]["bias"]
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class ConvBN(nn.Module):
    """Conv2d(bias-free) + BatchNorm + activation.

    Mirrors the reference's ubiquitous Conv block
    (reference: training/yolopt/nets/nn.py:28-39) but in NHWC. ``fuse`` at
    inference time is unnecessary: XLA folds inference-mode BN into the conv.
    """

    features: int
    kernel_size: int = 1
    strides: int = 1
    padding: Any = 0  # int or "SAME"
    groups: int = 1
    act: Optional[Callable] = nn.silu
    bn_eps: float = 1e-3
    bn_momentum: float = 0.97  # flax momentum = 1 - torch momentum (0.03)
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = inference_bn(
            nn.BatchNorm(
                use_running_average=not train,
                epsilon=self.bn_eps,
                momentum=self.bn_momentum,
                dtype=self.dtype,
                name="bn",
            ),
            x,
            train,
        )
        if self.act is not None:
            x = self.act(x)
        return x


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch ``nn.PReLU(num_parameters=C)``
    semantics; flax's builtin PReLU is scalar-only)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],), jnp.float32
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def nearest_upsample(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbor x`scale` upsample, NHWC (torch Upsample default)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def _linear_resize_matrix(
    in_size: int, out_size: int, align_corners: bool, dtype=jnp.float32
) -> jnp.ndarray:
    """(out, in) row-stochastic bilinear interpolation matrix.

    Expressing the fixed-size resize as two small matmuls keeps it on the MXU
    and lets XLA fuse it with neighboring ops (instead of gather-based
    ``jax.image.resize``, which cannot express align_corners=True at all —
    the reference's adapters use align_corners=True,
    reference: training/modify_models.py:47,237,359).
    """
    if out_size == 1:
        src = jnp.zeros((1,), dtype)
    elif align_corners:
        src = jnp.arange(out_size, dtype=dtype) * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = jnp.clip((jnp.arange(out_size, dtype=dtype) + 0.5) * scale - 0.5, 0.0, in_size - 1)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = src - lo.astype(dtype)
    rows = jnp.arange(out_size)
    m = jnp.zeros((out_size, in_size), dtype)
    m = m.at[rows, lo].add(1.0 - frac)
    m = m.at[rows, hi].add(frac)
    return m


def bilinear_resize(
    x: jnp.ndarray, out_hw: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize NHWC -> (B, H', W', C) as two separable matmuls.

    (A fused single-kronecker-matrix formulation — (out_h*out_w, h*w) against
    x flattened, K=400 instead of two K=20 dots — was profiled for the
    adapter upsamples and came out ~3% SLOWER end-to-end: XLA already fuses
    the separable dots into the consuming conv, and the kron variant adds a
    materialized intermediate + layout work. Keep separable.)
    """
    h_out, w_out = out_hw
    b, h, w, c = x.shape
    mh = _linear_resize_matrix(h, h_out, align_corners, x.dtype)
    mw = _linear_resize_matrix(w, w_out, align_corners, x.dtype)
    return jnp.einsum("oh,bhwc,pw->bopc", mh, x, mw)


class AdaptiveAvgPool(nn.Module):
    """Global average pool to (1, 1) (torch AdaptiveAvgPool2d((1,1)))."""

    @nn.compact
    def __call__(self, x):
        return x.mean(axis=(1, 2), keepdims=True)


def max_pool(x, window: int, strides: int = 1, padding: int = 0):
    """Max pool NHWC with symmetric integer padding (torch semantics)."""
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window, window, 1),
        (1, strides, strides, 1),
        pad,
    )
