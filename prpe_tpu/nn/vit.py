"""ViT encoder + ViTPose heatmap decoders.

Clean-room flax implementation matching the architecture of HuggingFace
``VitPoseForPoseEstimation("usyd-community/vitpose-base-simple")`` that the
reference wraps (reference: training/modify_models.py:388-407):
  * ViT-B/16 backbone over 256x192 inputs, patch-embed conv has padding=2,
    no CLS token; HF stores ``num_patches + 1`` position embeddings and adds
    ``pos[1:] + pos[:1]`` — we keep a single folded (num_patches, C) table
    (the porting code folds the extra token in)
  * "simple" decoder: ReLU -> bilinear x4 (align_corners=False) -> 3x3 conv
  * "classic" decoder: 2 deconv blocks + 1x1 conv

Attention keeps HF's separate q/k/v projections: measured on v5e, XLA
schedules the three matmuls better than a fused [q|k|v] Dense (-4% cascade
throughput when fused). Sequence length is 192 tokens, nothing to shard.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from prpe_tpu.nn.common import bilinear_resize, fast_gelu, inference_bn

Dtype = Any


class PatchEmbed(nn.Module):
    """k x k / stride-k patch-embedding conv, computed as pad + space-to-depth
    reshape + one (k*k*c, hidden) matmul.

    Because stride == kernel size the convolution is exactly a non-overlapping
    patch extraction followed by a dense projection. XLA lowers the equivalent
    ``nn.Conv`` forward acceptably, but its *backward* (grad wrt the 3-channel
    input) becomes a 16x16-scatter conv-transpose onto a 3-channel tensor that
    measured 73.4 ms/step at ~0.1 TFLOP/s on a v5e — 28% of the whole pose
    train step (tools/profile_train.py, 2026-08-18). The matmul formulation's
    backward is a plain [B*T, 768] x [768, 768] GEMM (~0.2 ms).

    Parameter names/shapes are identical to ``nn.Conv`` ((k, k, c, hidden)
    "kernel" + (hidden,) "bias"), so porting (models/porting.py:101-104) and
    existing checkpoints are unaffected. Matches HF ViTPose's
    ``patch_embeddings.projection`` conv semantics (padding=2).
    """

    hidden: int
    patch: int
    padding: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p, pad = self.patch, self.padding
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.hidden),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.hidden,), jnp.float32
        )
        gh = (h + 2 * pad - p) // p + 1
        gw = (w + 2 * pad - p) // p + 1
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        # patches tile the padded image from offset 0; any padded rows/cols
        # beyond gh*p / gw*p are never touched by the conv windows
        xp = xp[:, : gh * p, : gw * p]
        patches = xp.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, gh, gw, p * p * c).astype(self.dtype)
        # (kh, kw, c) flattening order matches the patch flattening above
        w_mat = kernel.reshape(p * p * c, self.hidden).astype(self.dtype)
        return patches @ w_mat + bias.astype(self.dtype)


class MHSA(nn.Module):
    hidden: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, t, self.heads, hd)
        k = k.reshape(b, t, self.heads, hd)
        v = v.reshape(b, t, self.heads, hd)
        # PRPE_ATTN_MODE selects the attention formulation (A/B'd on the
        # live chip by tools/bench_attention.py, ViTPose fwd b=128 bf16):
        #   pallas_packed  DEFAULT — fused kernel consuming the natural
        #                  (B,T,C) layout, heads sliced in VMEM, one batched
        #                  dot_general pair + fp32 softmax on-core
        #                  (ops/pallas/attention_kernel.py): 33.3 ms
        #   einsum         XLA einsum chain, fp32 softmax (round-2 default):
        #                  41.96 ms — the (B,H,T,T) tensor round-trips HBM
        #   einsum_bf16sm  einsums, bf16 softmax: 41.92 ms (no gain)
        #   pallas / pallas_unrolled  (B,H,T,D)-layout kernels: 44.5 ms —
        #                  the HBM transposes cost more than the kernel saves
        #   pallas_bh      per-(image,head) grid: 51.8 ms (grid overhead)
        # The kernel falls back to einsums off-TPU; backward is the einsum
        # recompute either way (custom_vjp), so this is numerics-safe for
        # training too. PRPE_FUSED_ATTENTION=1 is the legacy round-2 alias.
        import os

        mode = os.environ.get("PRPE_ATTN_MODE", "pallas_packed")
        if os.environ.get("PRPE_FUSED_ATTENTION") == "1" \
                and "PRPE_ATTN_MODE" not in os.environ:
            mode = "pallas_unrolled"
        if mode.startswith("pallas"):
            from prpe_tpu.ops.pallas.attention_kernel import mhsa_attention

            variant = mode[len("pallas_"):] or "batched"
            out = mhsa_attention(q, k, v, False, variant).reshape(b, t, c)
            return nn.Dense(self.hidden, dtype=self.dtype, name="proj")(out)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        if mode == "einsum_bf16sm":
            attn = jax.nn.softmax(attn, axis=-1)
        else:
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, c)
        return nn.Dense(self.hidden, dtype=self.dtype, name="proj")(out)


class _DenseParams(nn.Module):
    """Declares (and at apply time reads) exactly the parameters of an
    ``nn.Dense`` with the same name — kernel (in, out) lecun_normal + bias
    zeros — WITHOUT running the matmul. Lets the fused inference kernel
    consume raw weight arrays while keeping the param tree byte-identical
    to the module path (porting/checkpoints unaffected)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class _MHSAParams(nn.Module):
    """Param mirror of :class:`MHSA` (q/k/v/proj Dense weights)."""

    hidden: int

    @nn.compact
    def __call__(self):
        out = {}
        for name in ("q", "k", "v", "proj"):
            out[name] = _DenseParams(self.hidden, name=name)(self.hidden)
        return out


class _LNParams(nn.Module):
    """Param mirror of ``nn.LayerNorm`` (scale ones + bias zeros)."""

    @nn.compact
    def __call__(self, features: int):
        s = self.param("scale", nn.initializers.ones_init(), (features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (features,),
                       jnp.float32)
        return s, b


class ViTBlock(nn.Module):
    hidden: int
    heads: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def ln(name):
            mod = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=name)
            # materialize the normalized activations instead of letting XLA
            # fuse the fp32 LN reductions in as the GEMM's producer
            return lambda v: jax.lax.optimization_barrier(mod(v))

        import os

        # PRPE_ATTN_MODE=pallas_lnfused: inference-only WHOLE-half-block
        # Pallas kernel (LN1 -> q/k/v -> attention -> proj -> residual, one
        # VMEM program per image, weights resident across the grid —
        # ops/pallas/attention_kernel.py::fused_ln_mhsa). Training keeps the
        # module path (the kernel has no VJP); param trees are identical via
        # the _*Params mirrors.
        fused = (not train
                 and os.environ.get("PRPE_ATTN_MODE") == "pallas_lnfused")
        if fused:
            from prpe_tpu.ops.pallas.attention_kernel import fused_ln_mhsa

            ls, lb = _LNParams(name="ln1")(self.hidden)
            ap = _MHSAParams(self.hidden, name="attn")()
            x = fused_ln_mhsa(
                x.astype(self.dtype), ls, lb,
                ap["q"][0], ap["q"][1], ap["k"][0], ap["k"][1],
                ap["v"][0], ap["v"][1], ap["proj"][0], ap["proj"][1],
                heads=self.heads,
            )
        else:
            x = x + MHSA(self.hidden, self.heads, dtype=self.dtype,
                         name="attn")(ln("ln1")(x))
        y = ln("ln2")(x)
        y = nn.Dense(self.hidden * self.mlp_ratio, dtype=self.dtype, name="fc1")(y)
        y = fast_gelu(y)
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(y)
        return x + y


class ViTPoseBackbone(nn.Module):
    """ViT encoder over pose crops -> (B, H/16, W/16, hidden) feature map."""

    image_size: Tuple[int, int] = (256, 192)
    patch_size: int = 16
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        h, w = self.image_size
        # HF patch conv uses padding=2 with k=16/s=16 (see module docstring);
        # stride==kernel, so it lowers as patchify + matmul (PatchEmbed)
        gh = (h + 4 - self.patch_size) // self.patch_size + 1
        gw = (w + 4 - self.patch_size) // self.patch_size + 1
        x = PatchEmbed(
            hidden=self.hidden,
            patch=self.patch_size,
            padding=2,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, gh * gw, self.hidden)

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (gh * gw, self.hidden),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)[None]

        for i in range(self.layers):
            x = ViTBlock(self.hidden, self.heads, self.mlp_ratio, dtype=self.dtype,
                         name=f"block{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln_final")(x)
        return x.reshape(b, gh, gw, self.hidden)


class SimpleDecoder(nn.Module):
    """ReLU -> bilinear x`scale` -> 3x3 conv -> K heatmaps (NHWC)."""

    num_keypoints: int = 17
    scale_factor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        b, h, w, c = x.shape
        x = bilinear_resize(x, (h * self.scale_factor, w * self.scale_factor),
                            align_corners=False)
        return nn.Conv(self.num_keypoints, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv")(x)


class ClassicDecoder(nn.Module):
    """2x (deconv4x4/2 + BN + ReLU) -> 1x1 conv -> K heatmaps (NHWC)."""

    num_keypoints: int = 17
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(2):
            x = nn.ConvTranspose(
                256, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                use_bias=False, dtype=self.dtype, name=f"deconv{i}",
            )(x)
            x = inference_bn(
                nn.BatchNorm(
                    use_running_average=not train, epsilon=1e-5, momentum=0.9,
                    dtype=self.dtype, name=f"bn{i}",
                ),
                x,
                train,
            )
            x = nn.relu(x)
        return nn.Conv(self.num_keypoints, (1, 1), dtype=self.dtype, name="conv")(x)


class ViTPose(nn.Module):
    """Backbone + decoder -> heatmaps (B, K, Hh, Wh) — channels-first output
    to match the downstream heatmap ops' (B, K, H, W) convention."""

    image_size: Tuple[int, int] = (256, 192)
    num_keypoints: int = 17
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    patch_size: int = 16
    decoder: str = "simple"
    scale_factor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        feats = ViTPoseBackbone(
            image_size=self.image_size, patch_size=self.patch_size,
            hidden=self.hidden, layers=self.layers, heads=self.heads,
            mlp_ratio=self.mlp_ratio, dtype=self.dtype, name="backbone",
        )(x, train)
        if self.decoder == "simple":
            hm = SimpleDecoder(self.num_keypoints, self.scale_factor,
                               dtype=self.dtype, name="head")(feats, train)
        else:
            hm = ClassicDecoder(self.num_keypoints, dtype=self.dtype, name="head")(
                feats, train
            )
        return hm.transpose(0, 3, 1, 2)  # (B, K, H, W)
