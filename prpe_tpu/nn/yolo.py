"""YOLOv11 (n/t/s/m/l/x) — CSP-DarkNet backbone, PAN-FPN neck, decoupled
anchor-free head with DFL box regression.

Clean-room NHWC flax implementation of the architecture the reference vendors
(reference: training/yolopt/nets/nn.py:28-347). Differences by design:
  * training output is a list of NHWC per-level maps; eval decoding is a
    separate pure function (``decode_predictions``) instead of a mode-mutable
    forward, so each variant jits exactly once per (mode, shape)
  * strides are static (8, 16, 32) — the reference recomputes them with a
    dummy forward at build time (nets/nn.py:288-292); for this topology they
    are a constant
  * no conv+BN "fuse()" path: XLA constant-folds inference-mode BN into convs
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from prpe_tpu.nn.common import ConvBN, max_pool, nearest_upsample
from prpe_tpu.ops.anchors import dfl_decode, make_anchors

Dtype = Any

STRIDES = (8, 16, 32)

# width/depth/csp recipes (reference: nets/nn.py:308-347)
VARIANTS = {
    "n": dict(csp=(False, True), depth=(1, 1, 1, 1, 1, 1), width=(3, 16, 32, 64, 128, 256)),
    "t": dict(csp=(False, True), depth=(1, 1, 1, 1, 1, 1), width=(3, 24, 48, 96, 192, 384)),
    "s": dict(csp=(False, True), depth=(1, 1, 1, 1, 1, 1), width=(3, 32, 64, 128, 256, 512)),
    "m": dict(csp=(True, True), depth=(1, 1, 1, 1, 1, 1), width=(3, 64, 128, 256, 512, 512)),
    "l": dict(csp=(True, True), depth=(2, 2, 2, 2, 2, 2), width=(3, 64, 128, 256, 512, 512)),
    "x": dict(csp=(True, True), depth=(2, 2, 2, 2, 2, 2), width=(3, 96, 192, 384, 768, 768)),
}


class Residual(nn.Module):
    ch: int
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        mid = int(self.ch * self.e)
        y = ConvBN(mid, 3, padding=1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.ch, 3, padding=1, dtype=self.dtype, name="conv2")(y, train)
        return x + y


class CSPModule(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        half = self.out_ch // 2
        y = ConvBN(half, dtype=self.dtype, name="conv1")(x, train)
        y = Residual(half, e=1.0, dtype=self.dtype, name="res0")(y, train)
        y = Residual(half, e=1.0, dtype=self.dtype, name="res1")(y, train)
        z = ConvBN(half, dtype=self.dtype, name="conv2")(x, train)
        return ConvBN(self.out_ch, dtype=self.dtype, name="conv3")(
            jnp.concatenate([y, z], axis=-1), train
        )


class CSP(nn.Module):
    out_ch: int
    n: int
    csp: bool
    r: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = self.out_ch // self.r
        y = ConvBN(2 * c, dtype=self.dtype, name="conv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.csp:
                m = CSPModule(c, dtype=self.dtype, name=f"m{i}")
            else:
                m = Residual(c, dtype=self.dtype, name=f"m{i}")
            parts.append(m(parts[-1], train))
        return ConvBN(self.out_ch, dtype=self.dtype, name="conv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class SPP(nn.Module):
    out_ch: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        x = ConvBN(in_ch // 2, dtype=self.dtype, name="conv1")(x, train)
        y1 = max_pool(x, self.k, 1, self.k // 2)
        y2 = max_pool(y1, self.k, 1, self.k // 2)
        y3 = max_pool(y2, self.k, 1, self.k // 2)
        return ConvBN(self.out_ch, dtype=self.dtype, name="conv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class Attention(nn.Module):
    """Spatial self-attention over H*W tokens with a depthwise positional
    branch (reference: nets/nn.py:97-123). Channel layout per head is
    [q(dk), k(dk), v(dh)] to keep checkpoint-porting trivial."""

    ch: int
    num_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, c = x.shape
        dh = self.ch // self.num_head
        dk = dh // 2
        scale = dk**-0.5

        qkv = ConvBN(self.ch + dk * self.num_head * 2, act=None, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, h * w, self.num_head, dk * 2 + dh)
        q, k, v = jnp.split(qkv, [dk, 2 * dk], axis=-1)  # (B, HW, nh, *)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)

        pos = ConvBN(
            self.ch, 3, padding=1, groups=self.ch, act=None, dtype=self.dtype, name="pe"
        )(v.reshape(b, h, w, c), train)
        out = out + pos
        return ConvBN(self.ch, act=None, dtype=self.dtype, name="proj")(out, train)


class PSABlock(nn.Module):
    ch: int
    num_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x + Attention(self.ch, self.num_head, dtype=self.dtype, name="attn")(x, train)
        y = ConvBN(self.ch * 2, dtype=self.dtype, name="ffn1")(x, train)
        y = ConvBN(self.ch, act=None, dtype=self.dtype, name="ffn2")(y, train)
        return x + y


class PSA(nn.Module):
    ch: int
    n: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        half = self.ch // 2
        y = ConvBN(2 * half, dtype=self.dtype, name="conv1")(x, train)
        a, bb = y[..., :half], y[..., half:]
        for i in range(self.n):
            bb = PSABlock(half, max(1, self.ch // 128), dtype=self.dtype, name=f"blk{i}")(bb, train)
        return ConvBN(self.ch, dtype=self.dtype, name="conv2")(
            jnp.concatenate([a, bb], axis=-1), train
        )


class DarkNet(nn.Module):
    width: Sequence[int]
    depth: Sequence[int]
    csp: Sequence[bool]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        w, d, c = self.width, self.depth, self.csp
        cv = lambda f, name: ConvBN(f, 3, strides=2, padding=1, dtype=self.dtype, name=name)
        x = cv(w[1], "p1_conv")(x, train)
        x = cv(w[2], "p2_conv")(x, train)
        x = CSP(w[3], d[0], c[0], r=4, dtype=self.dtype, name="p2_csp")(x, train)
        x = cv(w[3], "p3_conv")(x, train)
        p3 = CSP(w[4], d[1], c[0], r=4, dtype=self.dtype, name="p3_csp")(x, train)
        x = cv(w[4], "p4_conv")(p3, train)
        p4 = CSP(w[4], d[2], c[1], r=2, dtype=self.dtype, name="p4_csp")(x, train)
        x = cv(w[5], "p5_conv")(p4, train)
        x = CSP(w[5], d[3], c[1], r=2, dtype=self.dtype, name="p5_csp")(x, train)
        x = SPP(w[5], dtype=self.dtype, name="p5_spp")(x, train)
        p5 = PSA(w[5], d[4], dtype=self.dtype, name="p5_psa")(x, train)
        return p3, p4, p5


class DarkFPN(nn.Module):
    width: Sequence[int]
    depth: Sequence[int]
    csp: Sequence[bool]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train=False):
        w, d, c = self.width, self.depth, self.csp
        p3, p4, p5 = feats
        p4 = CSP(w[4], d[5], c[0], r=2, dtype=self.dtype, name="h1")(
            jnp.concatenate([nearest_upsample(p5), p4], axis=-1), train
        )
        p3 = CSP(w[3], d[5], c[0], r=2, dtype=self.dtype, name="h2")(
            jnp.concatenate([nearest_upsample(p4), p3], axis=-1), train
        )
        d3 = ConvBN(w[3], 3, strides=2, padding=1, dtype=self.dtype, name="h3")(p3, train)
        p4 = CSP(w[4], d[5], c[0], r=2, dtype=self.dtype, name="h4")(
            jnp.concatenate([d3, p4], axis=-1), train
        )
        d4 = ConvBN(w[4], 3, strides=2, padding=1, dtype=self.dtype, name="h5")(p4, train)
        p5 = CSP(w[5], d[5], c[1], r=2, dtype=self.dtype, name="h6")(
            jnp.concatenate([d4, p5], axis=-1), train
        )
        return p3, p4, p5


def _cls_bias_init(nc: int, stride: int):
    v = math.log(5.0 / nc / (640.0 / stride) ** 2)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, v, dtype)

    return init


class Head(nn.Module):
    """Decoupled box(DFL)/cls head (reference: nets/nn.py:228-279).

    Emits raw per-level NHWC maps (B, H, W, 4*reg_max + nc).
    """

    nc: int
    filters: Sequence[int]
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train=False):
        box_ch = max(64, self.filters[0] // 4)
        cls_ch = max(80, self.filters[0], self.nc)
        outs = []
        for i, (x, stride) in enumerate(zip(feats, STRIDES)):
            f = x.shape[-1]
            b = ConvBN(box_ch, 3, padding=1, dtype=self.dtype, name=f"box{i}_0")(x, train)
            b = ConvBN(box_ch, 3, padding=1, dtype=self.dtype, name=f"box{i}_1")(b, train)
            b = nn.Conv(
                4 * self.reg_max, (1, 1), dtype=self.dtype, name=f"box{i}_out",
                bias_init=nn.initializers.ones,
            )(b)
            c = ConvBN(f, 3, padding=1, groups=f, dtype=self.dtype, name=f"cls{i}_0")(x, train)
            c = ConvBN(cls_ch, dtype=self.dtype, name=f"cls{i}_1")(c, train)
            c = ConvBN(cls_ch, 3, padding=1, groups=cls_ch, dtype=self.dtype, name=f"cls{i}_2")(c, train)
            c = ConvBN(cls_ch, dtype=self.dtype, name=f"cls{i}_3")(c, train)
            c = nn.Conv(
                self.nc, (1, 1), dtype=self.dtype, name=f"cls{i}_out",
                bias_init=_cls_bias_init(self.nc, stride),
            )(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


class YOLO(nn.Module):
    """Full detector. ``__call__`` returns raw per-level maps; use
    :func:`decode_predictions` for the eval-mode decoded output."""

    nc: int = 80
    variant: str = "n"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        spec = VARIANTS[self.variant]
        w, d, c = spec["width"], spec["depth"], spec["csp"]
        feats = DarkNet(w, d, c, dtype=self.dtype, name="net")(x, train)
        feats = DarkFPN(w, d, c, dtype=self.dtype, name="fpn")(feats, train)
        return Head(self.nc, (w[3], w[4], w[5]), dtype=self.dtype, name="head")(
            list(feats), train
        )


def decode_predictions(
    level_outputs: Sequence[jnp.ndarray],
    nc: int,
    reg_max: int = 16,
    strides: Sequence[int] = STRIDES,
) -> jnp.ndarray:
    """Eval-mode decode: (B, A, 4 + nc) with cxcywh pixel boxes + sigmoid
    scores (reference: nets/nn.py:261-270). Feed into ops.nms."""
    b = level_outputs[0].shape[0]
    no = 4 * reg_max + nc
    level_hw = [tuple(x.shape[1:3]) for x in level_outputs]
    x = jnp.concatenate([o.reshape(b, -1, no) for o in level_outputs], axis=1)
    anchor_points, stride_tensor = make_anchors(level_hw, strides, dtype=x.dtype)
    boxes_xyxy = dfl_decode(x[..., : 4 * reg_max], anchor_points, reg_max)
    x1y1, x2y2 = boxes_xyxy[..., :2], boxes_xyxy[..., 2:]
    boxes = jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1) * stride_tensor
    scores = jax.nn.sigmoid(x[..., 4 * reg_max :])
    return jnp.concatenate([boxes, scores], axis=-1)
