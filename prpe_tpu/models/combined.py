"""The combined multi-task model: shared ResNet-50 trunk + four branches.

Re-design of the reference's ``CombinedModel``
(reference: training/modify_models.py:462-534). The reference routes tasks by
*mutating* ``self.current_task``; under jit that would trigger retraces and
hide control flow from the compiler. Here the task is a **static argument**:
each task's forward is its own method, selected per jitted train/eval step —
four compiled programs sharing one parameter pytree, zero recompilation
thrash inside the round-robin loop.

Branches:
  * ``yolo_person`` / ``yolo_face``: YoloAdapter + YOLOv11-n (nc=1)
  * ``ada_face``: AdaFaceAdapter + IR-50 (64-ch input layer) + AdaFace kernel
  * ``vit_pose``: VitPoseAdapter + ViTPose-B simple decoder

The AdaFace margin EMA statistics live in the ``batch_stats`` collection next
to the BatchNorm running stats (the functional analogue of the reference's
registered buffers, libs/head_adaface.py:67-69).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from prpe_tpu.core.config import CombinedModelConfig
from prpe_tpu.nn.adapters import AdaFaceAdapter, VitPoseAdapter, YoloAdapter
from prpe_tpu.nn.irnet import build_irnet
from prpe_tpu.nn.resnet import ResNetTrunk
from prpe_tpu.nn.vit import ViTPose
from prpe_tpu.nn.yolo import YOLO
from prpe_tpu.ops import margin

TASKS = ("person_detection", "face_detection", "face_recognition", "pose_estimation")

Dtype = Any


class CombinedModel(nn.Module):
    config: CombinedModelConfig = CombinedModelConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.backbone = ResNetTrunk(
            stage_sizes=cfg.backbone_stages, remat=cfg.remat_backbone,
            dtype=self.dtype, name="backbone",
        )
        self.yolo_person_adapter = YoloAdapter(
            target_size=cfg.detection.adapter_size, dtype=self.dtype
        )
        self.yolo_person = YOLO(
            nc=cfg.detection.num_classes, variant=cfg.detection.variant, dtype=self.dtype
        )
        self.yolo_face_adapter = YoloAdapter(
            target_size=cfg.detection.adapter_size, dtype=self.dtype
        )
        self.yolo_face = YOLO(
            nc=cfg.detection.num_classes, variant=cfg.detection.variant, dtype=self.dtype
        )
        self.ada_face_adapter = AdaFaceAdapter(
            target_size=cfg.face.input_size, dtype=self.dtype
        )
        self.ada_face = build_irnet(
            cfg.face.arch, input_channels=64, dtype=self.dtype,
            embedding_size=cfg.face.embedding_size,
        )
        self.face_kernel = self.param(
            "face_kernel",
            lambda key: margin.init_kernel(key, cfg.face.embedding_size, cfg.face.num_classes),
        )
        # AdaFace margin EMA buffers (reference: libs/head_adaface.py:67-69)
        self.margin_mean = self.variable(
            "batch_stats", "margin_mean", lambda: jnp.asarray(20.0, jnp.float32)
        )
        self.margin_std = self.variable(
            "batch_stats", "margin_std", lambda: jnp.asarray(100.0, jnp.float32)
        )
        self.vit_pose_adapter = VitPoseAdapter(
            target_size=cfg.pose.input_size, dtype=self.dtype
        )
        self.vit_pose = ViTPose(
            image_size=cfg.pose.input_size,
            num_keypoints=cfg.pose.num_keypoints,
            hidden=cfg.pose.vit_hidden,
            layers=cfg.pose.vit_layers,
            heads=cfg.pose.vit_heads,
            mlp_ratio=cfg.pose.vit_mlp_ratio,
            patch_size=cfg.pose.patch_size,
            scale_factor=cfg.pose.decoder_scale_factor,
            dtype=self.dtype,
        )

    # ------------------------------------------------------------------ #
    def features(self, x, train: bool = False):
        """Shared trunk: (B, H, W, 3) -> (B, H/32, W/32, 2048)."""
        return self.backbone(x, train=train)

    def detect(self, x, branch: str = "person", train: bool = False):
        """Full-image detection forward -> list of raw per-level head maps."""
        feats = self.features(x, train)
        if branch == "person":
            pseudo = self.yolo_person_adapter(feats, train)
            return self.yolo_person(pseudo, train)
        pseudo = self.yolo_face_adapter(feats, train)
        return self.yolo_face(pseudo, train)

    def embed_face(self, x, train: bool = False):
        """Full-image -> identity embedding (B, 512) + pre-norm (B, 1)."""
        feats = self.features(x, train)
        adapted = self.ada_face_adapter(feats, train)
        return self.ada_face(adapted, train)

    def face_logits(self, x, labels, train: bool = True):
        """AdaFace margin logits for identity classification.

        Returns (B, num_classes) logits; updates the margin EMA statistics in
        ``batch_stats`` when train=True.
        """
        cfg = self.config.face
        emb, norms = self.embed_face(x, train)

        mean, std = self.margin_mean, self.margin_std
        state = margin.MarginState(batch_mean=mean.value, batch_std=std.value)
        logits, new_state = margin.adaface_logits(
            self.face_kernel.astype(jnp.float32),
            emb.astype(jnp.float32),
            norms.astype(jnp.float32),
            labels,
            state,
            m=cfg.m, h=cfg.h, s=cfg.s, t_alpha=cfg.t_alpha,
            update_stats=train,
        )
        if train and not self.is_initializing():
            mean.value = new_state.batch_mean
            std.value = new_state.batch_std
        return logits

    def pose(self, x, train: bool = False):
        """Full-image -> keypoint heatmaps (B, K, 64, 48)."""
        feats = self.features(x, train)
        adapted = self.vit_pose_adapter(feats, train)
        return self.vit_pose(adapted, train)

    def init_all(self, x, labels):
        """Touch every branch once so ``model.init`` creates the full
        parameter pytree. All branch input sizes are fixed by the adapters,
        so ``x`` may be any (B, H, W, 3) with H, W >= 64."""
        person = self.detect(x, "person")
        face = self.detect(x, "face")
        logits = self.face_logits(x, labels, train=False)
        heatmaps = self.pose(x)
        return person, face, logits, heatmaps

    def __call__(self, x, task: str = "pose_estimation", labels=None, train: bool = False):
        """Static-task dispatch (replaces the reference's mutable set_task,
        training/modify_models.py:476-494)."""
        if task == "person_detection":
            return self.detect(x, "person", train)
        if task == "face_detection":
            return self.detect(x, "face", train)
        if task == "face_recognition":
            if labels is not None:
                return self.face_logits(x, labels, train)
            return self.embed_face(x, train)
        if task == "pose_estimation":
            return self.pose(x, train)
        raise ValueError(f"unknown task {task!r}; supported: {TASKS}")
