"""Train state: params + batch stats + per-task optimizer states + EMA.

The reference shares one ``CombinedModel`` across four Lightning modules,
each with its own optimizer whose state is checkpointed per task
(reference: training/round_robin_trainer.py:294-319). The functional
equivalent: a single :class:`TrainState` holding the shared variables and a
``dict`` of optax states keyed by task name, all donated through the jitted
steps.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # global step counter
    params: Any
    batch_stats: Any
    opt_states: Dict[str, Any]
    ema_params: Optional[Any] = None
    ema_updates: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(
    variables: Dict[str, Any],
    optimizers: Dict[str, optax.GradientTransformation],
    use_ema: bool = False,
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_states={k: tx.init(params) for k, tx in optimizers.items()},
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
        ema_updates=jnp.zeros((), jnp.int32),
    )


def update_ema(
    ema_params: Any,
    params: Any,
    updates: jnp.ndarray,
    *,
    decay: float = 0.9999,
    tau: float = 2000.0,
) -> Any:
    """EMA with the reference's exponential warm-up ramp
    ``d = decay * (1 - exp(-updates / tau))``
    (reference: training/yolopt/util.py:445-466)."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype), ema_params, params
    )
