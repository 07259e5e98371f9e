"""Unified typed configuration tree.

The reference scatters configuration across argparse flags, per-task
``TaskConfig`` dataclasses, hardcoded ``Config`` classes and YAML files
(reference: training/round_robin_trainer.py:395-442, training/modify_models.py:300-311).
Here everything lives in one frozen dataclass tree so that configs are
hashable (usable as jit static args) and serializable.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

TASKS = (
    "person_detection",
    "face_detection",
    "face_recognition",
    "pose_estimation",
)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout.

    ``data`` replicates the reference's DDP data parallelism
    (reference: training/yolopt/main.py:46,56-60) over ICI; ``model`` shards
    the AdaFace 512x85742 classifier and other large matmuls.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 means "all remaining devices"
    data_parallel: int = -1
    model_parallel: int = 1


@dataclass(frozen=True)
class DetectionConfig:
    """YOLOv11 detection branch + NMS settings.

    NMS defaults mirror the reference exactly
    (reference: training/yolopt/util.py:123-127).
    """

    num_classes: int = 1
    variant: str = "n"  # n / t / s / m / l / x
    image_size: int = 640
    # adapter target resolution fed into YOLO from backbone features
    # (reference: training/modify_models.py:47 — 160x160 pseudo-image)
    adapter_size: Tuple[int, int] = (160, 160)
    conf_threshold: float = 0.001
    iou_threshold: float = 0.65
    max_det: int = 300
    # static candidate count pre-selected before on-device NMS
    pre_nms_top_k: int = 1024
    # class-offset trick constant (reference: training/yolopt/util.py:124)
    max_wh: float = 7680.0
    # loss gains (reference: yolopt defaults box=7.5 cls=0.5 dfl=1.5)
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    # TAL assigner (reference: training/yolopt/util.py:688)
    assigner_top_k: int = 10
    assigner_alpha: float = 0.5
    assigner_beta: float = 6.0
    # static per-image gt padding for the jitted loss
    max_gt: int = 64
    reg_max: int = 16  # DFL channels


@dataclass(frozen=True)
class AdaFaceConfig:
    """Face-recognition branch (reference: training/modify_models.py:300-311)."""

    arch: str = "ir_50"
    head: str = "adaface"  # adaface / arcface / cosface
    num_classes: int = 85742
    embedding_size: int = 512
    input_size: Tuple[int, int] = (112, 112)
    m: float = 0.4
    h: float = 0.333
    t_alpha: float = 0.01
    s: float = 64.0


@dataclass(frozen=True)
class PoseConfig:
    """Pose branch (reference: training/modify_models.py:352-374 +
    training/lightning/pose_estimation/module.py:155-205)."""

    num_keypoints: int = 17
    input_size: Tuple[int, int] = (256, 192)  # H, W fed into ViT
    heatmap_size: Tuple[int, int] = (64, 48)  # H, W
    sigma: float = 2.0
    keypoint_thresh: float = 0.3
    use_ohkm: bool = True
    ohkm_topk: int = 8
    use_oks_loss: bool = True
    oks_loss_weight: float = 0.1
    # static per-image instance padding (pad-to-max collate,
    # reference: training/lightning/pose_estimation/datamodule.py:455-463)
    max_instances: int = 16
    # ViT-B encoder
    vit_hidden: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp_ratio: int = 4
    patch_size: int = 16
    decoder_scale_factor: int = 4  # "simple" decoder: bilinear x4 + 3x3 conv


@dataclass(frozen=True)
class CombinedModelConfig:
    """The shared-backbone multi-task graft
    (reference: training/modify_models.py:462-534)."""

    backbone_channels: int = 2048
    # ResNet bottleneck counts per stage; (3, 4, 6, 3) == ResNet-50
    backbone_stages: Tuple[int, int, int, int] = (3, 4, 6, 3)
    # rematerialize backbone bottleneck blocks on backward (jax.checkpoint):
    # required to train the reference config (batch 32 @ 640^2) on one chip
    remat_backbone: bool = False
    image_size: int = 640
    detection: DetectionConfig = field(default_factory=DetectionConfig)
    face: AdaFaceConfig = field(default_factory=AdaFaceConfig)
    pose: PoseConfig = field(default_factory=PoseConfig)


@dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adam"  # adam / adamw / sgd
    learning_rate: float = 1e-3
    weight_decay: float = 5e-4
    grad_clip_norm: float = 10.0
    # schedule: constant / linear / cosine / onecycle
    schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 10_000
    min_lr: float = 1e-6
    # gradient accumulation (reference: round_robin_trainer.py:439)
    accumulate: int = 1
    # per-param-group lr multipliers keyed by TOP-LEVEL param-tree name
    # (exact match). The reference's pose optimizer runs the pretrained ViT
    # at 0.1x the adapter lr (pose_estimation/module.py:655-670).
    param_group_scales: Tuple[Tuple[str, float], ...] = ()
    # EMA (reference: training/yolopt/util.py:438-466)
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    use_ema: bool = False


@dataclass(frozen=True)
class DataConfig:
    data_dir: str = ""
    batch_size: int = 32
    num_workers: int = 4
    max_train_samples: Optional[int] = 2500
    max_val_samples: Optional[int] = 400
    shuffle_seed: int = 42


@dataclass(frozen=True)
class TaskConfig:
    """Per-task training config (reference: round_robin_trainer.py:53-61)."""

    name: str = "person_detection"
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    monitor: str = "val_loss"  # metric used for best-checkpoint selection
    monitor_mode: str = "min"
    # optional W&B project, one per task (reference: round_robin_trainer.py:464,485,509,532)
    wandb_project: Optional[str] = None
    # which params this task's optimizer trains: "branch" (reference parity —
    # each task optimizer covers only its branch, the shared trunk is in NO
    # optimizer; face_detection/module_v2.py:507-517 etc.), or
    # "branch+backbone" / "all" to fine-tune the trunk too
    trainable: str = "branch"


@dataclass(frozen=True)
class TrainConfig:
    """Round-robin orchestration (reference: round_robin_trainer.py:395-442)."""

    total_epochs: int = 15
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    save_every_epochs: int = 1
    keep_checkpoints: int = 3
    log_every_steps: int = 50
    bf16: bool = True
    tasks: Tuple[TaskConfig, ...] = ()


@dataclass(frozen=True)
class CascadeConfig:
    """detect -> recognize -> pose gated inference cascade."""

    # max person detections considered per image
    max_persons: int = 8
    # max face detections matched against the gallery
    max_faces: int = 8
    # cosine-similarity gate threshold for identity match
    match_threshold: float = 0.4
    # detection confidence gate for serving (the eval path uses the
    # reference's 1e-3; serving wants far fewer candidates)
    conf_threshold: float = 0.25
    # run pose only for persons whose face matched an enrolled identity
    gate_pose: bool = True
    # horizontal flip-test averaging on the pose stage (the reference's
    # eval-time accuracy trick, training/lightning/pose_estimation/
    # module.py:468-484) — doubles the ViTPose cost, off for serving
    pose_flip_test: bool = False
    # total IR-50 face-embedding slots across the whole batch: the top-F
    # face detections by score are compacted into a fixed (F, 112, 112, 3)
    # buffer (same static-shape compaction as the pose stage) instead of
    # embedding every (B, max_faces) slot, most of which are padding.
    # None -> 2 * batch_size at trace time.
    face_capacity: Optional[int] = None
    # static NMS candidate count for cascade inference. The cascade gates at
    # conf 0.25 (vs the eval path's 1e-3), so far fewer candidates survive;
    # a short candidate list shrinks the serial greedy-NMS scan.
    pre_nms_top_k: int = 256


@dataclass(frozen=True)
class FrameworkConfig:
    model: CombinedModelConfig = field(default_factory=CombinedModelConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    cascade: CascadeConfig = field(default_factory=CascadeConfig)


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(x) for x in obj]
    return obj


def config_to_json(cfg: Any) -> str:
    return json.dumps(_to_dict(cfg), indent=2)


def _from_dict(cls: type, data: Dict[str, Any]) -> Any:
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            v = _from_dict(f.type, v)
        kwargs[f.name] = v
    return cls(**kwargs)


def default_task_configs() -> Tuple[TaskConfig, ...]:
    """The four reference tasks with their monitors
    (reference: round_robin_trainer.py:150-184,444-534)."""
    return (
        TaskConfig(name="person_detection", monitor="val/mAP50-95", monitor_mode="max"),
        TaskConfig(name="face_detection", monitor="val/mAP50-95", monitor_mode="max"),
        TaskConfig(name="face_recognition", monitor="val_acc", monitor_mode="max"),
        # pose: AdamW + per-step OneCycle, pretrained ViT at 0.1x lr
        # (reference pose_estimation/module.py:649-694; wd 5e-4 from
        # round_robin_trainer.py:527). total_steps/warmup are filled in by
        # the caller once steps-per-epoch is known (cli/train.py).
        TaskConfig(
            name="pose_estimation", monitor="val_loss", monitor_mode="min",
            optim=OptimConfig(
                optimizer="adamw", weight_decay=5e-4, schedule="onecycle",
                param_group_scales=(("vit_pose", 0.1),),
            ),
        ),
    )
