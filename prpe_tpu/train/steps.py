"""Per-task jitted train / eval step factories.

Each task gets its *own* compiled program over the *shared* parameter pytree
(the TPU-native answer to the reference's mutable ``set_task`` +
Lightning-module-per-task design, training/round_robin_trainer.py:231-258).
The returned step functions donate the train state, so the round-robin loop
runs with zero host<->device parameter traffic and zero recompilation after
the first epoch.

Batch schemas (all static shapes; host pipeline pads):
  detection:        {image (B,H,W,3), gt_labels (B,M), gt_boxes (B,M,4 cxcywh
                     normalized), gt_mask (B,M)}
  face_recognition: {image (B,H,W,3), label (B,)}
  pose_estimation:  {image (B,H,W,3), keypoints (B,N,K,3), boxes (B,N,4),
                     areas (B,N), mask (B,N)}
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from prpe_tpu.core.config import CombinedModelConfig
from prpe_tpu.data.packed import apply_image_norm
from prpe_tpu.ops import heatmap as heatmap_ops
from prpe_tpu.ops import losses as L
from prpe_tpu.ops import nms as nms_ops
from prpe_tpu.ops.boxes import cxcywh_to_xyxy
from prpe_tpu.nn.yolo import decode_predictions
from prpe_tpu.train.state import TrainState, update_ema

DETECTION_TASKS = ("person_detection", "face_detection")

# Host normalization each task's dataset applies (detection: /255,
# object_detection/datamodule.py:93-100; faces: mean/std 0.5 —
# face_recognition/datamodule.py:195-199; pose: ImageNet —
# pose_estimation/datamodule.py:125-145). Packed uint8 batches re-apply it
# on-device via apply_image_norm.
TASK_IMAGE_NORM = {
    "person_detection": "unit",
    "face_detection": "unit",
    "face_recognition": "half",
    "pose_estimation": "imagenet",
}

# Param subtrees each task's optimizer covers. Reference parity: every task
# optimizer holds ONLY its branch (adapter + net [+ margin kernel]) — the
# shared ResNet trunk is in NO optimizer and never updates (reference:
# face_detection/module_v2.py:507-517 Adam(model.yolo_face.parameters()),
# face_recognition/module.py:176-187, pose_estimation/module.py:649-668).
TASK_BRANCHES = {
    "person_detection": ("yolo_person", "yolo_person_adapter"),
    "face_detection": ("yolo_face", "yolo_face_adapter"),
    "face_recognition": ("ada_face", "ada_face_adapter", "face_kernel"),
    "pose_estimation": ("vit_pose", "vit_pose_adapter"),
}


def trainable_mask(params, task: str, scope: str = "branch"):
    """Bool pytree: which params ``task``'s optimizer trains.

    scope: "branch" (reference parity), "branch+backbone" (also fine-tune
    the shared trunk), or "all".
    """
    if scope == "all":
        return jax.tree_util.tree_map(lambda _: True, params)
    keys = set(TASK_BRANCHES[task])
    if scope == "branch+backbone":
        keys.add("backbone")
    elif scope != "branch":
        raise ValueError(f"unknown trainable scope {scope!r}")
    return {
        k: jax.tree_util.tree_map(lambda _: k in keys, v)
        for k, v in params.items()
    }


def mask_optimizer(tx: optax.GradientTransformation, task: str,
                   scope: str = "branch") -> optax.GradientTransformation:
    """Restrict ``tx``'s state to the task's trainable params —
    ``optax.masked`` stores no moments for frozen leaves, which is what
    keeps four per-task Adam states resident in HBM at once (the reference
    holds four branch-sized optimizers the same way)."""
    if scope == "all":
        return tx
    return optax.masked(tx, lambda p: trainable_mask(p, task, scope))


def _branch(task: str) -> str:
    return "person" if task == "person_detection" else "face"


def make_loss_fn(model, task: str, cfg: CombinedModelConfig) -> Callable:
    """Returns loss_fn(params, batch_stats, batch, rng, train) ->
    (loss, (new_batch_stats, metrics))."""

    det = cfg.detection
    pose = cfg.pose

    def loss_fn(params, batch_stats, batch, rng, train: bool = True):
        # packed-pipeline batches ship raw uint8 pixels (4x cheaper over the
        # host->device link); re-apply the task's normalization on-device
        # where XLA fuses it into the first conv (data/packed.py)
        batch = dict(batch)
        batch["image"] = apply_image_norm(
            batch["image"], TASK_IMAGE_NORM[task]
        )
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"dropout": rng} if train else None
        mutable = ["batch_stats"] if train else []

        def apply(*args, method):
            if train:
                return model.apply(variables, *args, method=method,
                                   mutable=mutable, rngs=rngs)
            return model.apply(variables, *args, method=method), {"batch_stats": batch_stats}

        if task in DETECTION_TASKS:
            outs, mut = apply(batch["image"], _branch(task), train, method="detect")
            # loss math in fp32 regardless of the model compute dtype (the
            # raw per-level maps are small; TAL/CIoU/DFL in bf16 drift)
            outs = [o.astype(jnp.float32) for o in outs]
            dl = L.yolo_detection_loss(
                outs,
                batch["gt_labels"],
                batch["gt_boxes"],
                batch["gt_mask"],
                num_classes=det.num_classes,
                reg_max=det.reg_max,
                box_gain=det.box_gain,
                cls_gain=det.cls_gain,
                dfl_gain=det.dfl_gain,
                assigner_top_k=det.assigner_top_k,
                assigner_alpha=det.assigner_alpha,
                assigner_beta=det.assigner_beta,
            )
            metrics = {"loss": dl.total, "box_loss": dl.box,
                       "cls_loss": dl.cls, "dfl_loss": dl.dfl}
            return dl.total, (mut["batch_stats"], metrics)

        if task == "face_recognition":
            logits, mut = apply(batch["image"], batch["label"], train,
                                method="face_logits")
            # log-sum-exp over 85k classes needs fp32
            logits = logits.astype(jnp.float32)
            loss = L.softmax_cross_entropy(logits, batch["label"]).mean()
            acc = (logits.argmax(-1) == batch["label"]).astype(jnp.float32).mean()
            return loss, (mut["batch_stats"], {"loss": loss, "acc": acc})

        if task == "pose_estimation":
            kpts = batch["keypoints"]
            coords, vis = kpts[..., :2], kpts[..., 2]
            target_hm, target_w = heatmap_ops.generate_target_heatmaps(
                coords, vis, batch["areas"],
                heatmap_size=pose.heatmap_size, sigma=pose.sigma,
            )
            pred_hm, mut = apply(batch["image"], train, method="pose")
            pred_hm = pred_hm.astype(jnp.float32)
            hm_loss = L.joints_mse_loss(
                pred_hm, target_hm, target_w,
                use_ohkm=pose.use_ohkm, ohkm_topk=pose.ohkm_topk,
            )
            total = hm_loss
            metrics = {"heatmap_loss": hm_loss}
            # metrics decode: amplitude-invariant argmax (the soft decode is
            # center-biased on unit-amplitude maps — see ops/heatmap.py)
            pred_coords, pred_scores = heatmap_ops.decode_heatmaps(
                pred_hm, boxes=batch["boxes"][:, 0]
            )
            if pose.use_oks_loss:
                # the OKS loss TERM needs d(coords)/d(heatmap): use the
                # differentiable soft decode (reference parity) here only
                soft_coords, _ = heatmap_ops.decode_heatmaps(
                    pred_hm, boxes=batch["boxes"][:, 0], method="soft"
                )
                ol = L.oks_loss(
                    soft_coords, coords[:, 0], vis[:, 0], batch["areas"][:, 0],
                    loss_weight=pose.oks_loss_weight,
                )
                total = total + ol
                metrics["oks_loss"] = ol
            metrics["loss"] = total
            # reference-parity PCK: the reference thresholds NORMALIZED
            # coordinate distances against 0.2*sqrt(area) in PIXELS
            # (pose_estimation/module.py:433-440), so it saturates at 1.0
            # for any prediction — reproduced for log parity. pck_px is the
            # intended metric with both sides in letterboxed pixels.
            metrics["pck"] = L.pck_accuracy(
                pred_coords, coords[:, 0], vis[:, 0], batch["areas"][:, 0]
            )
            img_size = jnp.asarray(batch["image"].shape[1], jnp.float32)
            metrics["pck_px"] = L.pck_accuracy(
                pred_coords * img_size, coords[:, 0] * img_size,
                vis[:, 0], batch["areas"][:, 0],
            )
            return total, (mut["batch_stats"], metrics)

        raise ValueError(f"unknown task {task!r}")

    return loss_fn


def make_train_step(
    model,
    task: str,
    tx: optax.GradientTransformation,
    cfg: CombinedModelConfig,
    *,
    use_ema: bool = False,
    ema_decay: float = 0.9999,
    ema_tau: float = 2000.0,
    trainable: str = "branch",
) -> Callable[[TrainState, Dict[str, Any], jax.Array], Tuple[TrainState, Dict]]:
    """Returns ``step(state, batch, rng) -> (state, metrics)``.

    Only the ACTIVE task's optimizer state crosses the jit boundary: threading
    the other tasks' (donated, untouched) optimizer trees through the program
    multiplies XLA's buffer-aliasing work by the number of tasks — measured
    >10x compile-time blowup under an 8-device SPMD mesh. The sibling opt
    states stay on device untouched in the host-side TrainState dict.

    ``trainable`` ("branch" default = reference parity, see TASK_BRANCHES)
    stop-gradients the frozen subtrees, so XLA drops their entire backward
    pass (e.g. the ResNet-50 backbone backward at 640^2), and zeroes their
    updates regardless of how ``tx`` treats unmasked leaves.
    """
    loss_fn = make_loss_fn(model, task, cfg)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def _step(params, batch_stats, opt_state, ema_params, ema_updates, batch, rng):
        mask = trainable_mask(params, task, trainable)

        def frozen_loss(p, *args):
            p = jax.tree_util.tree_map(
                lambda leaf, m: leaf if m else jax.lax.stop_gradient(leaf),
                p, mask,
            )
            return loss_fn(p, *args)

        grad_fn = jax.value_and_grad(frozen_loss, has_aux=True)
        (loss, (new_stats, metrics)), grads = grad_fn(
            params, batch_stats, batch, rng, True
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        # belt + braces: frozen leaves must not move even when tx passes
        # their (zero) grads through untransformed (plain optax.masked
        # semantics for masked-out leaves)
        updates = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask
        )
        new_params = optax.apply_updates(params, updates)
        if use_ema and ema_params is not None:
            ema_updates = ema_updates + 1
            ema_params = update_ema(
                ema_params, new_params, ema_updates,
                decay=ema_decay, tau=ema_tau,
            )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_params, new_stats, new_opt, ema_params, ema_updates, metrics

    def step(state: TrainState, batch, rng):
        params, stats, opt, ema, ema_n, metrics = _step(
            state.params, state.batch_stats, state.opt_states[task],
            state.ema_params if use_ema else None,
            state.ema_updates, batch, rng,
        )
        opt_states = dict(state.opt_states)
        opt_states[task] = opt
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=stats,
            opt_states=opt_states,
            ema_params=ema if use_ema else state.ema_params,
            ema_updates=ema_n if use_ema else state.ema_updates,
        )
        return new_state, metrics

    return step


# ---------------------------------------------------------------------- #
# Shared detection program: person_detection and face_detection are
# architecturally identical by construction (models/combined.py builds both
# branches from the same DetectionConfig — reference parity, both are
# yolo11n nc=1 surgeries of the SAME yolo11n.pt, modify_models.py:183-205).
# Their train/eval steps therefore compile to the same XLA program modulo
# which param subtrees they read; re-keying person<->face subtrees lets ONE
# compiled program serve both tasks. Under an SPMD mesh each detection
# train-step compile is minutes on a small host (VERDICT r3: 300s), so the
# round-robin trainer and the multichip dryrun both share it.

_DETECTION_SWAP = {
    "yolo_person": "yolo_face",
    "yolo_face": "yolo_person",
    "yolo_person_adapter": "yolo_face_adapter",
    "yolo_face_adapter": "yolo_person_adapter",
}


def swap_detection_branches(tree):
    """Re-key the detection-branch subtrees person<->face anywhere they
    appear in a params-shaped container (params, batch_stats, optax states,
    EMA trees). An involution: applying it twice is the identity. Containers
    are rebuilt host-side only — no device traffic."""
    if isinstance(tree, dict):
        has_pair = set(_DETECTION_SWAP) <= set(tree)
        return {
            (_DETECTION_SWAP[k] if has_pair and k in _DETECTION_SWAP else k):
                swap_detection_branches(v)
            for k, v in tree.items()
        }
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # optax states
        return type(tree)(*(swap_detection_branches(v) for v in tree))
    if isinstance(tree, (list, tuple)):
        return type(tree)(swap_detection_branches(v) for v in tree)
    return tree


def _swap_detection_state(state: TrainState) -> TrainState:
    """Swap a TrainState's detection branches AND the two detection tasks'
    optimizer-state slots, so the sibling task's program sees exactly the
    structure it was compiled for. Involution."""
    opt = {k: swap_detection_branches(v) for k, v in state.opt_states.items()}
    if "person_detection" in opt and "face_detection" in opt:
        opt["person_detection"], opt["face_detection"] = (
            opt["face_detection"], opt["person_detection"])
    return state.replace(
        params=swap_detection_branches(state.params),
        batch_stats=swap_detection_branches(state.batch_stats),
        opt_states=opt,
        ema_params=(None if state.ema_params is None
                    else swap_detection_branches(state.ema_params)),
    )


def make_shared_detection_train_step(sibling_step: Callable) -> Callable:
    """Train step for one detection task that REUSES the other detection
    task's already-jitted step (zero extra compiles). Correct only when the
    two tasks use the same optimizer config and trainable scope — callers
    must check (round_robin.py does)."""

    def step(state: TrainState, batch, rng):
        new_state, metrics = sibling_step(_swap_detection_state(state), batch, rng)
        return _swap_detection_state(new_state), metrics

    return step


def make_shared_detection_eval_step(sibling_eval_step: Callable) -> Callable:
    """Eval-step analogue of :func:`make_shared_detection_train_step`."""

    def step(variables, batch):
        return sibling_eval_step(
            {k: swap_detection_branches(v) for k, v in variables.items()},
            batch,
        )

    return step


def make_eval_step(model, task: str, cfg: CombinedModelConfig) -> Callable:
    """Jitted eval step -> metrics dict (+ fixed-shape predictions where the
    task has a host-side evaluation stage)."""
    loss_fn = make_loss_fn(model, task, cfg)
    det = cfg.detection
    pose = cfg.pose

    @jax.jit
    def step(variables, batch):
        batch = dict(batch)
        batch["image"] = apply_image_norm(
            batch["image"], TASK_IMAGE_NORM[task]
        )
        params, batch_stats = variables["params"], variables["batch_stats"]
        dummy_rng = jax.random.key(0)

        if task in DETECTION_TASKS:
            loss, (_, metrics) = loss_fn(params, batch_stats, batch, dummy_rng, False)
            outs = model.apply(variables, batch["image"], _branch(task), False,
                               method="detect")
            decoded = decode_predictions(outs, det.num_classes, det.reg_max)
            detections = nms_ops.non_max_suppression(
                decoded,
                conf_threshold=det.conf_threshold,
                iou_threshold=det.iou_threshold,
                max_det=det.max_det,
                pre_nms_top_k=det.pre_nms_top_k,
                max_wh=det.max_wh,
            )
            # The combined model's detection branch runs YOLO on the
            # adapter's pseudo-image (reference: modify_models.py:47 — 160²),
            # so decoded boxes are in ADAPTER pixels. The mAP hook compares
            # against gt in model-image pixels — rescale here so Detections
            # leave the step in the frame every consumer expects.
            ah, aw = det.adapter_size
            ih = jnp.asarray(batch["image"].shape[1], detections.boxes.dtype)
            iw = jnp.asarray(batch["image"].shape[2], detections.boxes.dtype)
            scale = jnp.stack([iw / aw, ih / ah, iw / aw, ih / ah])
            detections = detections._replace(boxes=detections.boxes * scale)
            return metrics, detections

        if task == "face_recognition":
            # Reference-parity validation (face_recognition/module.py:119-157):
            # one backbone forward, then MARGIN-FREE scaled cosine for both
            # val loss (plain CE) and val accuracy (argmax). An earlier
            # version of this port incorrectly reused the margin-penalized
            # TRAINING logits here — AdaFace subtracts the margin on the true
            # class, so that argmax is biased against the correct identity
            # and val acc sat below chance even as the model learned
            # (runs/r4_round_robin_convergence: train acc 0.74, val acc 0.0).
            # The margin-logit numbers are kept as `loss_margin`/`acc_margin`
            # diagnostics — they are NOT reference eval metrics.
            from prpe_tpu.ops import margin as margin_ops

            fc = cfg.face
            emb, norms = model.apply(variables, batch["image"], False,
                                     method="embed_face")
            emb32 = emb.astype(jnp.float32)
            kernel = params["face_kernel"].astype(jnp.float32)
            cos = margin_ops.normalized_cosine(kernel, emb32)  # unclipped
            logits = cos * fc.s
            loss = L.softmax_cross_entropy(logits, batch["label"]).mean()
            acc = (logits.argmax(-1) == batch["label"]).astype(jnp.float32).mean()
            mstate = margin_ops.MarginState(
                batch_stats["margin_mean"], batch_stats["margin_std"])
            mlogits, _ = margin_ops.adaface_logits(
                kernel, emb32, norms.astype(jnp.float32), batch["label"],
                mstate, m=fc.m, h=fc.h, s=fc.s, t_alpha=fc.t_alpha,
                update_stats=False)
            metrics = {
                "loss": loss, "acc": acc,
                "loss_margin": L.softmax_cross_entropy(
                    mlogits, batch["label"]).mean(),
                "acc_margin": (mlogits.argmax(-1) == batch["label"]).astype(
                    jnp.float32).mean(),
            }
            # embeddings feed the host-side verification hook (LFW protocol)
            return metrics, emb32

        if task == "pose_estimation":
            loss, (_, metrics) = loss_fn(params, batch_stats, batch, dummy_rng, False)
            # horizontal flip-test averaging
            # (reference: training/lightning/pose_estimation/module.py:468-484)
            hm = model.apply(variables, batch["image"], False, method="pose")
            hm_flip = model.apply(
                variables, jnp.flip(batch["image"], axis=2), False, method="pose"
            )
            hm = (hm + heatmap_ops.flip_heatmaps(hm_flip)) * 0.5
            coords, scores = heatmap_ops.decode_heatmaps(
                hm.astype(jnp.float32), boxes=batch["boxes"][:, 0]
            )
            return metrics, (coords, scores)

        raise ValueError(task)

    return step
