"""Adapter networks grafting shared ResNet features onto each task branch.

Clean-room NHWC equivalents of the reference's three adapter stacks:
  * YOLO adapter  — 2048->512 1x1, bilinear(160,160, align_corners=True),
    progressive reduction to a 3-channel pseudo-image, then per-image
    standardize + sigmoid (reference: training/modify_models.py:40-87)
  * AdaFace adapter — 2048->512 with PReLU, bilinear(112,112), reduction to
    64 channels (reference: training/modify_models.py:230-252)
  * ViTPose adapter — 2048->512 with GELU, bilinear(256,192), reduction to
    3 channels (reference: training/modify_models.py:352-374)

The adapter convs carry bias (torch nn.Conv2d default) unlike the bias-free
backbone convs.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax.numpy as jnp
from flax import linen as nn

from prpe_tpu.nn.common import PReLU, bilinear_resize, fast_gelu, inference_bn

Dtype = Any


class _ConvBNAct(nn.Module):
    features: int
    kernel: int
    act: str  # silu | gelu | prelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(p, p), (p, p)], use_bias=True, dtype=self.dtype,
                    name="conv")(x)
        x = inference_bn(
            nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype, name="bn"),
            x, train)
        if self.act == "silu":
            return nn.silu(x)
        if self.act == "gelu":
            return fast_gelu(x)
        if self.act == "prelu":
            return PReLU(dtype=self.dtype, name="prelu")(x)
        raise ValueError(self.act)


class YoloAdapter(nn.Module):
    """2048-ch features -> (B, 160, 160, 3) standardized pseudo-image."""

    target_size: Tuple[int, int] = (160, 160)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = _ConvBNAct(512, 1, "silu", dtype=self.dtype, name="reduce")(x, train)
        x = bilinear_resize(x, self.target_size, align_corners=True)
        x = _ConvBNAct(512, 3, "silu", dtype=self.dtype, name="spatial")(x, train)
        x = _ConvBNAct(256, 1, "silu", dtype=self.dtype, name="down1")(x, train)
        x = _ConvBNAct(128, 3, "silu", dtype=self.dtype, name="down2")(x, train)
        x = _ConvBNAct(64, 1, "silu", dtype=self.dtype, name="down3")(x, train)
        x = _ConvBNAct(3, 3, "silu", dtype=self.dtype, name="out")(x, train)
        # per-image, per-channel standardize + sigmoid
        # (reference: training/modify_models.py:84-87)
        mean = x.mean(axis=(1, 2), keepdims=True)
        std = x.std(axis=(1, 2), keepdims=True)
        x = (x - mean) / (std + 1e-6)
        return nn.sigmoid(x)


class AdaFaceAdapter(nn.Module):
    """2048-ch features -> (B, 112, 112, 64) face-branch input."""

    target_size: Tuple[int, int] = (112, 112)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = _ConvBNAct(512, 1, "prelu", dtype=self.dtype, name="reduce")(x, train)
        x = bilinear_resize(x, self.target_size, align_corners=True)
        x = _ConvBNAct(256, 3, "prelu", dtype=self.dtype, name="down1")(x, train)
        x = _ConvBNAct(128, 3, "prelu", dtype=self.dtype, name="down2")(x, train)
        x = _ConvBNAct(64, 3, "prelu", dtype=self.dtype, name="out")(x, train)
        return x


class VitPoseAdapter(nn.Module):
    """2048-ch features -> (B, 256, 192, 3) pose-branch input."""

    target_size: Tuple[int, int] = (256, 192)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = _ConvBNAct(512, 1, "gelu", dtype=self.dtype, name="reduce")(x, train)
        x = bilinear_resize(x, self.target_size, align_corners=True)
        x = _ConvBNAct(256, 3, "gelu", dtype=self.dtype, name="down1")(x, train)
        x = _ConvBNAct(128, 3, "gelu", dtype=self.dtype, name="down2")(x, train)
        x = _ConvBNAct(3, 3, "gelu", dtype=self.dtype, name="out")(x, train)
        return x
