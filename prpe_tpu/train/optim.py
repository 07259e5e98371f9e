"""Optimizers and LR schedules (optax).

Feature parity with the reference's optimization toolkit:
  * Adam/AdamW/SGD-nesterov with bias+norm weight-decay exclusion
    (reference: training/yolopt/util.py:358-373)
  * Linear / Cosine warmup schedules (reference: training/yolopt/util.py:398-435)
  * OneCycle (reference: training/lightning/pose_estimation/module.py:681-693)
  * global-norm gradient clipping max 10 (reference: training/yolopt/util.py:340-342)
  * gradient accumulation via optax.MultiSteps
    (reference: training/yolopt/main.py:27,117)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from prpe_tpu.core.config import OptimConfig


def build_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    warmup = max(cfg.warmup_steps, 1)
    decay = max(cfg.total_steps - warmup, 1)
    if cfg.schedule == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(cfg.min_lr, cfg.learning_rate, warmup),
                optax.linear_schedule(cfg.learning_rate, cfg.min_lr, decay),
            ],
            [warmup],
        )
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=cfg.min_lr,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            decay_steps=cfg.total_steps,
            end_value=cfg.min_lr,
        )
    if cfg.schedule == "onecycle":
        # torch OneCycleLR semantics: start at max/25, end at max/1e4
        return optax.join_schedules(
            [
                optax.cosine_onecycle_schedule(
                    transition_steps=cfg.total_steps,
                    peak_value=cfg.learning_rate,
                    pct_start=warmup / max(cfg.total_steps, 1),
                    div_factor=25.0,
                    final_div_factor=1e4,
                )
            ],
            [],
        )
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def _decay_mask(params: Any) -> Any:
    """True where weight decay applies: exclude biases and norm scales
    (reference: training/yolopt/util.py:358-373)."""

    def leaf_mask(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        last = names[-1] if names else ""
        if last in ("bias", "scale", "alpha"):  # bias / norm weight / PReLU
            return False
        # any BatchNorm/LayerNorm param
        if any(n.startswith("bn") or "norm" in n.lower() or n.startswith("ln") for n in names[:-1]):
            return False
        return getattr(leaf, "ndim", 0) > 1

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [leaf_mask(p, l) for p, l in flat]
    )


def build_optimizer(
    cfg: OptimConfig, params: Optional[Any] = None
) -> optax.GradientTransformation:
    schedule = build_schedule(cfg)

    if cfg.optimizer == "adam":
        core = optax.adam(schedule)
    elif cfg.optimizer == "adamw":
        mask = _decay_mask(params) if params is not None else None
        core = optax.adamw(schedule, weight_decay=cfg.weight_decay, mask=mask)
    elif cfg.optimizer == "sgd":
        core = optax.chain(
            optax.add_decayed_weights(
                cfg.weight_decay, mask=_decay_mask(params) if params is not None else None
            ),
            optax.sgd(schedule, momentum=0.937, nesterov=True),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), core)
    for prefix, scale in cfg.param_group_scales:
        # per-group lr: scale the post-optimizer update of one top-level
        # param subtree (torch param-group semantics — the reference's pose
        # AdamW runs the ViT at 0.1x lr, pose_estimation/module.py:655-670)
        tx = optax.chain(tx, optax.masked(optax.scale(scale),
                                          _subtree_mask(prefix)))
    if cfg.accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate)
    return tx


def _subtree_mask(name: str) -> Callable[[Any], Any]:
    """Mask callable: True exactly on the top-level subtree ``name``."""

    def fn(params):
        return {
            k: jax.tree_util.tree_map(lambda _: k == name, v)
            for k, v in params.items()
        }

    return fn
