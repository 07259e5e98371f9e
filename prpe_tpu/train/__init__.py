from prpe_tpu.train.optim import build_optimizer, build_schedule
from prpe_tpu.train.state import TrainState, create_train_state, update_ema

__all__ = [
    "build_optimizer",
    "build_schedule",
    "TrainState",
    "create_train_state",
    "update_ema",
]
