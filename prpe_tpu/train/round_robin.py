"""Round-robin multi-task trainer.

Re-design of the reference orchestrator
(reference: training/round_robin_trainer.py:63-393). Semantics preserved:
  * per epoch, cycle tasks in order, training one epoch-slice of each on the
    shared model (reference: :240-258)
  * per-task optimizer state persisted across the cycle (reference: :294-319)
  * per-task best-checkpoint monitors (reference: :150-184)
  * combined checkpoint after every (epoch, task) + resume (reference: :375-393)

TPU-native differences:
  * each task's step is a separately-jitted program over the shared donated
    train state — switching tasks costs nothing after the first epoch (the
    reference rebuilds Lightning fit loops per task per epoch)
  * data parallelism: batches arrive host-sharded and get mesh sharding
    constraints; gradients/BN stats reduce globally under jit (DDP+SyncBN
    equivalent, reference: training/yolopt/main.py:46-60)
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from prpe_tpu.core.config import CombinedModelConfig, TaskConfig, TrainConfig
from prpe_tpu.train.checkpoint import CheckpointManager
from prpe_tpu.train.metrics import MetricsLogger, MetricTracker, WandbSink, setup_logging
from prpe_tpu.train.optim import build_optimizer
from prpe_tpu.train.state import TrainState, create_train_state
from prpe_tpu.train.steps import (
    DETECTION_TASKS, make_eval_step, make_shared_detection_eval_step,
    make_shared_detection_train_step, make_train_step, mask_optimizer,
)


@dataclass
class TaskRuntime:
    config: TaskConfig
    train_step: Callable
    eval_step: Callable
    train_loader: Callable[[int], Iterable]  # epoch -> iterable of batches
    val_loader: Optional[Callable[[int], Iterable]] = None
    eval_hook: Optional[Callable[[list], Dict[str, float]]] = None
    # eval_hook consumes the accumulated list of (predictions, host_batch)
    # pairs — predictions already device_get, batch as the loader yielded
    # it — and returns extra host-side metrics (mAP, COCO AP, ...)


class RoundRobinTrainer:
    def __init__(
        self,
        model,
        model_cfg: CombinedModelConfig,
        train_cfg: TrainConfig,
        variables: Dict[str, Any],
        task_loaders: Dict[str, Dict[str, Any]],
        *,
        log_dir: str = "runs",
        mesh=None,
    ):
        """
        Args:
          model: CombinedModel instance (architecture only).
          variables: initialized {params, batch_stats}.
          task_loaders: per task name -> dict with keys ``train`` (epoch ->
            iterable of batches), optional ``val`` and ``eval_hook``.
        """
        self.model = model
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.mesh = mesh
        self.logger = setup_logging(log_dir)
        self.metrics_logger = MetricsLogger(log_dir)
        self.ckpt = CheckpointManager(train_cfg.checkpoint_dir, keep=train_cfg.keep_checkpoints)

        tasks = train_cfg.tasks
        # per-task optimizers masked to the task's trainable scope: frozen
        # leaves hold no Adam moments, so four resident optimizer states cost
        # branch-sized memory, exactly like the reference's four
        # branch-parameter optimizers (round_robin_trainer.py:294-319)
        self.optimizers = {
            t.name: mask_optimizer(
                build_optimizer(t.optim, variables["params"]),
                t.name, t.trainable,
            )
            for t in tasks
        }
        self.state = create_train_state(
            variables, self.optimizers,
            use_ema=any(t.optim.use_ema for t in tasks),
        )
        # person/face detection are identical programs (same DetectionConfig
        # branches, models/combined.py) — when their optimizer + trainable
        # configs also match, the second task reuses the first's compiled
        # step via branch re-keying instead of paying its own multi-minute
        # SPMD compile (train/steps.py::make_shared_detection_train_step)
        det_cfgs = {t.name: t for t in tasks if t.name in DETECTION_TASKS}
        share_detection = (
            len(det_cfgs) == 2
            and len({(t.optim, t.trainable) for t in det_cfgs.values()}) == 1
        )
        self.tasks: Dict[str, TaskRuntime] = {}
        for t in tasks:
            loaders = task_loaders[t.name]
            sibling = next(
                (self.tasks[n] for n in DETECTION_TASKS
                 if n != t.name and n in self.tasks),
                None,
            ) if share_detection and t.name in DETECTION_TASKS else None
            if sibling is not None:
                train_step = make_shared_detection_train_step(sibling.train_step)
                eval_step = make_shared_detection_eval_step(sibling.eval_step)
            else:
                train_step = make_train_step(
                    model, t.name, self.optimizers[t.name], model_cfg,
                    use_ema=t.optim.use_ema,
                    ema_decay=t.optim.ema_decay, ema_tau=t.optim.ema_tau,
                    trainable=t.trainable,
                )
                eval_step = make_eval_step(model, t.name, model_cfg)
            self.tasks[t.name] = TaskRuntime(
                config=t,
                train_step=train_step,
                eval_step=eval_step,
                train_loader=loaders["train"],
                val_loader=loaders.get("val"),
                eval_hook=loaders.get("eval_hook"),
            )
        self.wandb = {
            t.name: WandbSink(t.wandb_project, run_name=f"round_robin_{t.name}")
            for t in tasks if t.wandb_project
        }
        self.start_epoch = 0
        # index of the first task to run at start_epoch (mid-cycle resume)
        self._resume_task_index = 0
        self._rng = jax.random.key(train_cfg.seed)

    # ----------------------------------------------------------------- #
    def _mesh_ctx(self):
        import contextlib

        return self.mesh if self.mesh is not None else contextlib.nullcontext()

    def _put_batch(self, batch):
        """Constrain a host batch to the mesh's batch sharding (the
        DistributedSampler + DDP scatter equivalent)."""
        if self.mesh is None:
            return batch
        import jax.numpy as jnp

        from prpe_tpu.parallel.mesh import batch_sharding

        return jax.device_put(
            {k: jnp.asarray(v) for k, v in batch.items()},
            batch_sharding(self.mesh),
        )

    # ----------------------------------------------------------------- #
    def resume(self, path: Optional[str] = None):
        """Restore state + epoch bookkeeping
        (reference: round_robin_trainer.py:375-393).

        Checkpoints are written after every (epoch, task), so a crash
        mid-cycle must resume with the REMAINING tasks of that epoch —
        restarting at epoch+1 would silently drop the un-run tasks'
        epoch-slice of training (and their eval/best updates).
        """
        restored, entry = self.ckpt.restore(jax.device_get(self.state), path)
        self.state = restored
        epoch = int(entry.get("epoch", -1))
        names = list(self.tasks)
        last = entry.get("last_task")
        if last in names and last != names[-1]:
            self.start_epoch = epoch
            self._resume_task_index = names.index(last) + 1
        else:
            self.start_epoch = epoch + 1
            self._resume_task_index = 0
        self.logger.info(
            "resumed from %s (epoch %s, last task %s -> continuing at "
            "epoch %d task %s)",
            path or "latest", entry.get("epoch"), last,
            self.start_epoch, names[self._resume_task_index],
        )

    # ----------------------------------------------------------------- #
    def train_task_epoch(self, epoch: int, name: str) -> Dict[str, float]:
        rt = self.tasks[name]
        tracker = MetricTracker()
        t0 = time.time()
        n_images = 0
        collected = []
        log_every = max(1, self.cfg.log_every_steps)
        with self._mesh_ctx():
            for i, batch in enumerate(rt.train_loader(epoch)):
                self._rng, step_rng = jax.random.split(self._rng)
                self.state, metrics = rt.train_step(
                    self.state, self._put_batch(batch), step_rng)
                bs = next(iter(batch.values())).shape[0]
                n_images += bs
                # keep metric scalars on device: a per-step device_get would
                # block the host on every step and serialize batch prep with
                # device compute; one transfer per epoch overlaps them
                collected.append((metrics, bs))
                if (i + 1) % log_every == 0:
                    self.logger.info(
                        "epoch %d | task %s | step %d | loss %.5f (%.0f img/s)",
                        epoch, name, i + 1, float(metrics["loss"]),
                        n_images / max(time.time() - t0, 1e-9),
                    )
        for m, bs in jax.device_get(collected):
            tracker.update(m, bs)
        means = {f"train/{k}": v for k, v in tracker.means().items()}
        dt = time.time() - t0
        means["train/images_per_sec"] = n_images / max(dt, 1e-9)
        return means

    def eval_task(self, epoch: int, name: str) -> Dict[str, float]:
        rt = self.tasks[name]
        if rt.val_loader is None:
            return {}
        tracker = MetricTracker()
        outputs = []
        # evaluate the EMA weights when the task maintains them — the
        # reference's standalone trainer always validates the EMA model
        # (yolopt/main.py:135-161); scoring best-checkpoint monitors on the
        # raw weights would select on the noisier metric while paying the
        # EMA update cost for nothing
        params = self.state.params
        if rt.config.optim.use_ema and self.state.ema_params is not None:
            params = self.state.ema_params
        variables = {"params": params, "batch_stats": self.state.batch_stats}
        with self._mesh_ctx():
            for batch in rt.val_loader(epoch):
                metrics, preds = rt.eval_step(variables, self._put_batch(batch))
                bs = next(iter(batch.values())).shape[0]
                tracker.update(jax.device_get(metrics), bs)
                outputs.append((jax.device_get(preds), batch))
        means = {f"val/{k}": v for k, v in tracker.means().items()}
        if rt.eval_hook is not None:
            means.update({f"val/{k}": v for k, v in rt.eval_hook(outputs).items()})
        # reference-compatible aliases for monitors
        if "val/loss" in means:
            means.setdefault("val_loss", means["val/loss"])
        if "val/acc" in means:
            means.setdefault("val_acc", means["val/acc"])
        return means

    # ----------------------------------------------------------------- #
    def train(self, total_epochs: Optional[int] = None) -> Dict[str, Any]:
        total_epochs = total_epochs or self.cfg.total_epochs
        history = []
        for epoch in range(self.start_epoch, total_epochs):
            for ti, (name, rt) in enumerate(self.tasks.items()):
                if epoch == self.start_epoch and ti < self._resume_task_index:
                    continue  # mid-cycle resume: this task already ran
                self.logger.info("epoch %d | task %s", epoch, name)
                metrics = self.train_task_epoch(epoch, name)
                metrics.update(self.eval_task(epoch, name))
                self.metrics_logger.log_epoch(epoch, name, metrics)
                if name in self.wandb:
                    self.wandb[name].log(metrics, step=epoch)
                history.append({"epoch": epoch, "task": name, **metrics})

                mon = rt.config.monitor
                val = metrics.get(mon)
                if val is None:
                    # fall back: monitor under val/ prefix (explicit None
                    # checks — a legitimate monitor value of 0.0 is not
                    # "missing")
                    val = metrics.get(f"val/{mon}")
                if val is None:
                    val = metrics.get(mon.replace("val/", "val_"))
                if val is not None:
                    self.ckpt.update_best(
                        name, mon, float(val), rt.config.monitor_mode,
                        self.state, epoch,
                    )
                if (epoch + 1) % self.cfg.save_every_epochs == 0:
                    self.ckpt.save(self.state, epoch, name, metrics)
                self.logger.info(
                    "epoch %d | task %s | %s", epoch, name,
                    {k: round(float(v), 5) for k, v in metrics.items()},
                )
        for sink in self.wandb.values():
            sink.finish()
        return {"history": history, "state": self.state}
