"""Mixed-precision policy.

The reference uses CUDA AMP fp16 + GradScaler (reference:
training/yolopt/main.py:63,98,114; round_robin_trainer.py:201). On TPU the
idiomatic equivalent is bfloat16 compute with fp32 params and no loss
scaling (bf16 has fp32's exponent range).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # losses / reductions always accumulate in fp32
    accum_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        def _cast(x):
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return jax.tree_util.tree_map(_cast, tree)


def default_policy(bf16: bool = True) -> DTypePolicy:
    if bf16 and jax.default_backend() == "tpu":
        return DTypePolicy()
    return DTypePolicy(compute_dtype=jnp.float32)
