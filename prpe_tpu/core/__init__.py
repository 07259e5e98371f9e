from prpe_tpu.core.config import (
    AdaFaceConfig,
    CascadeConfig,
    CombinedModelConfig,
    DataConfig,
    DetectionConfig,
    FrameworkConfig,
    MeshConfig,
    OptimConfig,
    PoseConfig,
    TaskConfig,
    TrainConfig,
)
from prpe_tpu.core.dtypes import DTypePolicy, default_policy

__all__ = [
    "AdaFaceConfig",
    "CascadeConfig",
    "CombinedModelConfig",
    "DataConfig",
    "DetectionConfig",
    "FrameworkConfig",
    "MeshConfig",
    "OptimConfig",
    "PoseConfig",
    "TaskConfig",
    "TrainConfig",
    "DTypePolicy",
    "default_policy",
]
