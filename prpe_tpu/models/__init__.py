from prpe_tpu.models.combined import CombinedModel, TASKS

__all__ = ["CombinedModel", "TASKS"]
