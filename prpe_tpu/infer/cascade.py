"""The selective-pose cascade: detect persons -> detect faces -> embed faces ->
cosine-gate against enrolled identities -> pose ONLY the matched persons.

This is the thesis concept the reference never finished wiring together (its
CombinedModel routes one task at a time via ``set_task``,
reference: training/modify_models.py:476-494; the gating logic exists only as
prose). TPU-native realization:

  * one jitted program, all stages on-device, fixed shapes everywhere
  * detection NMS, ROI crops, identity matching and heatmap decode are the
    on-device ops from ``prpe_tpu.ops`` — zero host round-trips
  * the "selective" part is a **top-G compaction**: matched persons from the
    whole batch are gathered (lax.top_k on gate scores) into a fixed
    ``(G, 256, 192, 3)`` buffer and only those G crops pay the ViTPose-B
    cost. FLOPs scale with matched-person capacity, not batch size — the
    data-dependent skip a GPU implementation would express with Python
    branching becomes a static-shape gather.

Component models are the *standalone* pretrained nets (the reference's
``component_models/``): YOLOv11-n person + face at 640^2, IR-50 on 112^2 BGR
crops, ViTPose-B on 256x192 crops (BASELINE.json benchmark configs).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from prpe_tpu.core.config import CascadeConfig, DetectionConfig, PoseConfig
from prpe_tpu.nn.irnet import IRNet
from prpe_tpu.nn.vit import ViTPose
from prpe_tpu.nn.yolo import YOLO, decode_predictions
from prpe_tpu.ops import nms as nms_ops
from prpe_tpu.ops.heatmap import decode_heatmaps
from prpe_tpu.ops.roi import crop_and_resize_batch

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


class CascadeModel(nn.Module):
    """Standalone component models bundled for the cascade."""

    detection: DetectionConfig = DetectionConfig()
    pose_cfg: PoseConfig = PoseConfig()
    irnet_layers: int = 50
    dtype: Any = jnp.float32

    def setup(self):
        self.person_yolo = YOLO(nc=1, variant=self.detection.variant, dtype=self.dtype)
        self.face_yolo = YOLO(nc=1, variant=self.detection.variant, dtype=self.dtype)
        self.irnet = IRNet(num_layers=self.irnet_layers, dtype=self.dtype)
        self.vitpose = ViTPose(
            image_size=self.pose_cfg.input_size,
            num_keypoints=self.pose_cfg.num_keypoints,
            hidden=self.pose_cfg.vit_hidden,
            layers=self.pose_cfg.vit_layers,
            heads=self.pose_cfg.vit_heads,
            mlp_ratio=self.pose_cfg.vit_mlp_ratio,
            patch_size=self.pose_cfg.patch_size,
            scale_factor=self.pose_cfg.decoder_scale_factor,
            dtype=self.dtype,
        )

    def detect_person(self, x):
        return self.person_yolo(x, False)

    def detect_face(self, x):
        return self.face_yolo(x, False)

    def embed(self, crops):
        return self.irnet(crops, False)

    def pose(self, crops):
        return self.vitpose(crops, False)

    def init_all(self, x, face_crop, pose_crop):
        return (
            self.detect_person(x),
            self.detect_face(x),
            self.embed(face_crop),
            self.pose(pose_crop),
        )


class CascadeResult(NamedTuple):
    persons: nms_ops.Detections  # (B, Kp, ...)
    faces: nms_ops.Detections  # (B, Kf, ...)
    face_identity: jnp.ndarray  # (B, Kf) best gallery index (-1 = no match)
    face_similarity: jnp.ndarray  # (B, Kf) best cosine similarity (-1 for
    # slots outside the top-F embedding budget, see CascadeConfig.face_capacity)
    person_gated: jnp.ndarray  # (B, Kp) bool — matched identity inside box
    # () bool — True when valid face detections exceeded the top-F embedding
    # budget (CascadeConfig.face_capacity): some faces got similarity -1 /
    # no identity without being scored. Callers on crowded workloads should
    # re-run with a larger face_capacity when this fires.
    face_budget_saturated: jnp.ndarray
    # pose slots (G = pose capacity across the batch):
    pose_image_idx: jnp.ndarray  # (G,)
    pose_boxes: jnp.ndarray  # (G, 4) person box of each slot
    pose_keypoints: jnp.ndarray  # (G, K, 2) image-pixel coordinates
    pose_scores: jnp.ndarray  # (G, K)
    pose_valid: jnp.ndarray  # (G,)


def _face_person_gate(person_det, face_det, face_matched):
    """person_gated[b, i] = any matched face whose center lies in person box."""
    fcx = (face_det.boxes[..., 0] + face_det.boxes[..., 2]) / 2  # (B, Kf)
    fcy = (face_det.boxes[..., 1] + face_det.boxes[..., 3]) / 2
    pb = person_det.boxes  # (B, Kp, 4)
    inside = (
        (fcx[:, None, :] >= pb[..., 0:1])
        & (fcx[:, None, :] <= pb[..., 2:3])
        & (fcy[:, None, :] >= pb[..., 1:2])
        & (fcy[:, None, :] <= pb[..., 3:4])
    )  # (B, Kp, Kf)
    ok = inside & face_matched[:, None, :] & face_det.valid[:, None, :]
    return ok.any(-1) & person_det.valid


def build_cascade_runner(
    model: CascadeModel,
    cascade_cfg: CascadeConfig = CascadeConfig(),
    *,
    pose_capacity: Optional[int] = None,
    mesh=None,
):
    """Returns jitted run(variables, images, gallery) -> CascadeResult.

    Args:
      images: (B, S, S, 3) RGB in [0, 1].
      gallery: (G_ids, 512) L2-normalized enrolled identity embeddings.
      mesh: optional jax.sharding.Mesh with a "data" axis — scale-out
        serving: the image batch shards over `data` (weights/gallery
        replicated) and GSPMD inserts the cross-chip collectives for the
        batch-global top-F/top-G compactions. Replaces nothing in the
        reference (it has no serving path at all); per-chip batch should be
        the single-chip knee (see bench.py).
    """
    det = model.detection
    pose_cfg = model.pose_cfg
    kp, kf = cascade_cfg.max_persons, cascade_cfg.max_faces

    def run(variables, images, gallery):
        b = images.shape[0]
        size = images.shape[1]
        # both budgets clamp to the candidate count: top_k with k larger
        # than b*K (e.g. pose_capacity > B*max_persons) is a trace error
        g_slots = min(pose_capacity or max(1, b * 2), b * kp)
        f_slots = min(cascade_cfg.face_capacity or max(1, b * 2), b * kf)
        nms_k = min(cascade_cfg.pre_nms_top_k, det.pre_nms_top_k)

        # ---- stage 1: detection (both heads share nothing but the image) --
        # one up-front cast to the model compute dtype: both YOLO passes share
        # the converted/retiled buffer instead of each paying the fp32->bf16
        # retile on the 640^2 input. (Feeding bf16 images from the host skips
        # the cast entirely — pixel-coordinate math in the ROI crops is fp32
        # internally regardless of image dtype, see prpe_tpu/ops/roi.py.)
        # uint8 input (packed disk pipeline, data/packed.py) is accepted
        # directly: /255 fuses into the cast and the host->device transfer
        # shrinks 2-4x.
        if images.dtype == jnp.uint8:
            from prpe_tpu.data.packed import apply_image_norm

            images = apply_image_norm(images, "unit", dtype=model.dtype)
        x_det = images.astype(model.dtype)
        person_maps = model.apply(variables, x_det, method="detect_person")
        face_maps = model.apply(variables, x_det, method="detect_face")
        person_det = nms_ops.non_max_suppression(
            decode_predictions(person_maps, det.num_classes, det.reg_max),
            conf_threshold=cascade_cfg.conf_threshold,
            iou_threshold=det.iou_threshold,
            max_det=kp, pre_nms_top_k=nms_k,
        )
        face_det = nms_ops.non_max_suppression(
            decode_predictions(face_maps, det.num_classes, det.reg_max),
            conf_threshold=cascade_cfg.conf_threshold,
            iou_threshold=det.iou_threshold,
            max_det=kf, pre_nms_top_k=nms_k,
        )

        # ---- stage 2: face crops -> IR-50 embeddings -> gallery match -----
        # Top-F compaction across the batch: only the F highest-score face
        # detections (a fixed budget, cascade_cfg.face_capacity) pay the
        # IR-50 cost — padding slots stay out of the conv stack entirely.
        face_score = jnp.where(
            face_det.valid, face_det.scores, -jnp.inf
        ).reshape(b * kf)
        fs_scores, fs_idx = jax.lax.top_k(face_score, f_slots)
        fs_valid = jnp.isfinite(fs_scores)
        fs_img = fs_idx // kf
        fs_boxes = face_det.boxes.reshape(b * kf, 4)[fs_idx]
        crops = crop_and_resize_batch(
            images, fs_boxes, fs_img, (112, 112)
        )  # (F, 112, 112, 3) RGB [0, 1]
        crops = (crops - 0.5) / 0.5
        crops = crops[..., ::-1]  # AdaFace BGR convention
        emb, _ = model.apply(variables, crops, method="embed")  # (F, 512)
        sims = emb @ gallery.T  # (F, G_ids)
        slot_sim = jnp.where(fs_valid, sims.max(-1), -1.0)
        slot_id = sims.argmax(-1)
        # scatter the per-slot results back to the (B, Kf) detection grid
        best_sim = jnp.full((b * kf,), -1.0, slot_sim.dtype).at[fs_idx].set(
            slot_sim, mode="drop"
        ).reshape(b, kf)
        best_id = jnp.zeros((b * kf,), jnp.int32).at[fs_idx].set(
            slot_id.astype(jnp.int32), mode="drop"
        ).reshape(b, kf)
        matched = (best_sim > cascade_cfg.match_threshold) & face_det.valid
        face_identity = jnp.where(matched, best_id, -1)
        # budget saturation: more valid faces than embedding slots means some
        # were never scored against the gallery (silently unmatched otherwise)
        face_budget_saturated = face_det.valid.sum() > f_slots

        # ---- stage 3: gate persons by contained matched faces -------------
        if cascade_cfg.gate_pose:
            gated = _face_person_gate(person_det, face_det, matched)
        else:
            gated = person_det.valid

        # ---- stage 4: top-G compaction + ViTPose on matched persons only --
        gate_score = jnp.where(gated, person_det.scores, -jnp.inf).reshape(-1)
        top_scores, top_idx = jax.lax.top_k(gate_score, g_slots)  # over B*Kp
        slot_valid = jnp.isfinite(top_scores)
        slot_img = top_idx // kp
        slot_boxes = person_det.boxes.reshape(b * kp, 4)[top_idx]

        ph, pw = pose_cfg.input_size
        pose_crops = crop_and_resize_batch(images, slot_boxes, slot_img, (ph, pw))
        pose_crops = (pose_crops - IMAGENET_MEAN) / IMAGENET_STD
        heatmaps = model.apply(variables, pose_crops, method="pose")
        if cascade_cfg.pose_flip_test:
            # average with the horizontally-flipped forward (L/R channels
            # swapped back) — reference: pose_estimation/module.py:468-484
            from prpe_tpu.ops.heatmap import flip_heatmaps

            hm_flip = model.apply(
                variables, jnp.flip(pose_crops, axis=2), method="pose"
            )
            heatmaps = (heatmaps + flip_heatmaps(hm_flip)) * 0.5
        coords, kscores = decode_heatmaps(
            heatmaps.astype(jnp.float32), boxes=slot_boxes
        )  # normalized within crop

        bw = slot_boxes[:, 2] - slot_boxes[:, 0]
        bh = slot_boxes[:, 3] - slot_boxes[:, 1]
        img_x = coords[..., 0] * bw[:, None] + slot_boxes[:, 0:1]
        img_y = coords[..., 1] * bh[:, None] + slot_boxes[:, 1:2]
        kpts = jnp.stack([img_x, img_y], -1)

        return CascadeResult(
            persons=person_det,
            faces=face_det,
            face_identity=face_identity,
            face_similarity=best_sim,
            person_gated=gated,
            face_budget_saturated=face_budget_saturated,
            pose_image_idx=jnp.where(slot_valid, slot_img, -1),
            pose_boxes=slot_boxes,
            pose_keypoints=kpts,
            pose_scores=kscores * slot_valid[:, None],
            pose_valid=slot_valid,
        )

    if mesh is None:
        return jax.jit(run)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(run, in_shardings=(replicated, batch_sharded, replicated))
