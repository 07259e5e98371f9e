"""IR-Net (ArcFace/AdaFace residual) face-embedding backbones.

Clean-room NHWC flax implementation of the IR / IR-SE family the reference
vendors from the public AdaFace repo (reference: libs/net_adaface.py:144-419):
BasicBlockIR / BottleneckIR (+SE), depths 18/34/50/100/152/200, 112x112 or
224x224 inputs, 512-d embedding head that returns the *pre-normalization norm*
alongside the L2-normalized embedding — the norm feeds AdaFace's adaptive
margin (see prpe_tpu/ops/margin.py).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from prpe_tpu.nn.common import PReLU, inference_bn

Dtype = Any

_BN = dict(epsilon=1e-5, momentum=0.9)

# (depth, num_units) per stage, keyed by num_layers
# (reference: libs/net_adaface.py:222-266)
_BLOCKS = {
    18: ((64, 2), (128, 2), (256, 2), (512, 2)),
    34: ((64, 3), (128, 4), (256, 6), (512, 3)),
    50: ((64, 3), (128, 4), (256, 14), (512, 3)),
    100: ((64, 3), (128, 13), (256, 30), (512, 3)),
    152: ((256, 3), (512, 8), (1024, 36), (2048, 3)),
    200: ((256, 3), (512, 24), (1024, 36), (2048, 3)),
}


class SEModule(nn.Module):
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=False, dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class BasicBlockIR(nn.Module):
    depth: int
    stride: int
    use_se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda name: (lambda y: inference_bn(nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name, **_BN
        ), y, train))
        in_ch = x.shape[-1]
        if in_ch == self.depth:
            # MaxPool2d(1, stride) == strided subsample
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(
                self.depth, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="shortcut_conv",
            )(x)
            shortcut = bn("shortcut_bn")(shortcut)

        r = bn("bn0")(x)
        r = nn.Conv(self.depth, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(r)
        r = bn("bn1")(r)
        r = PReLU(dtype=self.dtype, name="prelu")(r)
        r = nn.Conv(self.depth, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(r)
        r = bn("bn2")(r)
        if self.use_se:
            r = SEModule(dtype=self.dtype, name="se")(r)
        return r + shortcut


class BottleneckIR(nn.Module):
    depth: int
    stride: int
    use_se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda name: (lambda y: inference_bn(nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name, **_BN
        ), y, train))
        in_ch = x.shape[-1]
        mid = self.depth // 4
        if in_ch == self.depth:
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(
                self.depth, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="shortcut_conv",
            )(x)
            shortcut = bn("shortcut_bn")(shortcut)

        r = bn("bn0")(x)
        r = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(r)
        r = bn("bn1")(r)
        r = PReLU(dtype=self.dtype, name="prelu1")(r)
        r = nn.Conv(mid, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(r)
        r = bn("bn2")(r)
        r = PReLU(dtype=self.dtype, name="prelu2")(r)
        r = nn.Conv(self.depth, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="conv3")(r)
        r = bn("bn3")(r)
        if self.use_se:
            r = SEModule(dtype=self.dtype, name="se")(r)
        return r + shortcut


class IRNet(nn.Module):
    """IR / IR-SE backbone -> (embedding (B, 512), norm (B, 1)).

    ``input_channels`` defaults to 3 (RGB/BGR face crops); the combined-model
    graft replaces the input layer with a 64-channel one
    (reference: training/modify_models.py:271-275), expressed here simply as
    ``input_channels=64``.
    """

    num_layers: int = 50
    mode: str = "ir"  # ir | ir_se
    input_channels: int = 3
    input_size: int = 112  # 112 or 224
    embedding_size: int = 512
    dropout_rate: float = 0.4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda name: (lambda y: inference_bn(nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name, **_BN
        ), y, train))
        use_se = self.mode == "ir_se"
        blocks = _BLOCKS[self.num_layers]
        block_cls = BasicBlockIR if self.num_layers <= 100 else BottleneckIR
        out_ch = 512 if self.num_layers <= 100 else 2048

        x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="input_conv")(x)
        x = bn("input_bn")(x)
        x = PReLU(dtype=self.dtype, name="input_prelu")(x)

        idx = 0
        for depth, num_units in blocks:
            for u in range(num_units):
                stride = 2 if u == 0 else 1
                x = block_cls(depth, stride, use_se, dtype=self.dtype, name=f"body{idx}")(
                    x, train
                )
                idx += 1

        # output layer: BN -> dropout -> flatten -> linear -> BN1d(affine=False)
        x = bn("output_bn")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = x.reshape(x.shape[0], -1)  # NHWC flatten (porting permutes weights)
        x = nn.Dense(self.embedding_size, dtype=self.dtype, name="output_linear")(x)
        x = inference_bn(
            nn.BatchNorm(
                use_running_average=not train, use_bias=False, use_scale=False,
                dtype=self.dtype, name="output_bn1d", **_BN,
            ),
            x,
            train,
        )

        norm = jnp.linalg.norm(x.astype(jnp.float32), axis=1, keepdims=True)
        norm = jnp.maximum(norm, 1e-12)  # guard all-zero embeddings
        embedding = x / norm.astype(x.dtype)
        return embedding, norm


def build_irnet(name: str = "ir_50", **kw) -> IRNet:
    """Factory mirroring the reference's build_model names
    (reference: libs/net_adaface.py:16-28)."""
    parts = name.split("_")
    mode = "ir_se" if "se" in parts else "ir"
    num_layers = int(parts[-1])
    if num_layers == 101:
        num_layers = 100
    return IRNet(num_layers=num_layers, mode=mode, **kw)
