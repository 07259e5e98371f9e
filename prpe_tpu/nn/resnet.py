"""ResNet-50 trunk (shared multi-task backbone).

The reference truncates a pretrained torchvision ResNet-50 to conv1..layer4
(reference: training/modify_models.py:413-452), producing
``[B, 2048, H/32, W/32]`` features. This is a clean-room NHWC flax
implementation of the same torchvision v1.5 architecture (stride in the 3x3
bottleneck conv) so that torchvision checkpoints port directly
(see prpe_tpu/models/porting.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from prpe_tpu.nn.common import inference_bn, max_pool

Dtype = Any

_BN = dict(epsilon=1e-5, momentum=0.9)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: (lambda y: inference_bn(nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name, **_BN
        ), y, train))
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
            use_bias=False, dtype=self.dtype, name=name,
        )
        shortcut = x
        out = nn.relu(bn("bn1")(conv(self.features, 1, 1, 0, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.features, 3, self.strides, 1, "conv2")(out)))
        out = bn("bn3")(conv(self.features * 4, 1, 1, 0, "conv3")(out))
        if self.downsample:
            shortcut = bn("downsample_bn")(
                conv(self.features * 4, 1, self.strides, 0, "downsample_conv")(x)
            )
        return nn.relu(out + shortcut)


class ResNetTrunk(nn.Module):
    """conv1..layer4, no avgpool/fc. Output (B, H/32, W/32, 2048).

    ``remat=True`` rematerializes each bottleneck block on the backward pass
    (jax.checkpoint per block): training at the reference config (batch 32 at
    640^2, reference round_robin_trainer.py:400-407) holds ~8 GB of trunk
    activations even in bf16 — per-block remat bounds live activations to the
    block inputs at ~1/3 extra forward FLOPs. Forward-only (inference) paths
    are unaffected.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = inference_bn(
            nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="bn1", **_BN
            ),
            x,
            train,
        )
        x = nn.relu(x)
        x = max_pool(x, 3, strides=2, padding=1)

        # static_argnums counts the bound module as arg 0: (self, x, train)
        block_cls = (
            nn.remat(Bottleneck, static_argnums=(2,)) if self.remat else Bottleneck
        )
        features = 64
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                x = block_cls(
                    features=features,
                    strides=strides,
                    downsample=(block == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)
            features *= 2
        return x
