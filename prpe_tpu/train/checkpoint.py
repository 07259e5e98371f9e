"""Orbax checkpointing of the combined train state.

Parity with the reference's two mechanisms
(reference: training/round_robin_trainer.py:294-319,375-393):
  * combined checkpoints per (epoch, task): params + batch stats + per-task
    optimizer states + bookkeeping (epoch, last_task)
  * best-checkpoint tracking per task monitor
Resume restores everything — no ``configure_optimizers`` monkey-patching
needed because optimizer state is first-class here.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from prpe_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ckpt = ocp.StandardCheckpointer()
        self._meta_path = self.dir / "meta.json"

    def _wait(self):
        """Block until the save is committed to disk. Newer orbax makes
        StandardCheckpointer async — without this, a restore right after
        save() races the background commit (and interpreter shutdown kills
        the committing thread outright)."""
        wait = getattr(self._ckpt, "wait_until_finished", None)
        if wait is not None:
            wait()

    def _clear_slot(self, name: str):
        """Remove the destination dir AND any orbax staging leftovers for
        ``name``. A SIGKILL mid-save leaves ``<name>.orbax-checkpoint-tmp*``
        (and sometimes a half-committed destination); the next save of the
        same slot then dies in orbax's rename ("Cannot rename ...tmp.
        Destination exists" / "Destination already exists") — both observed
        as real resume crashes in runs/r5_round_robin_convergence
        phase2_resume{,1}.log. Every save goes through here first."""
        for p in [*self.dir.glob(name),
                  *self.dir.glob(name + ".orbax-checkpoint-tmp*")]:
            if p.is_dir():
                shutil.rmtree(p, ignore_errors=True)

    def _save_slot(self, name: str, payload) -> None:
        """Save with stale-state clearing + one clear-and-retry."""
        self._wait()  # drain any in-flight commit before touching the slot
        self._clear_slot(name)
        path = self.dir / name
        try:
            self._ckpt.save(path, payload)
            self._wait()
        except (ValueError, FileExistsError, OSError):
            self._clear_slot(name)
            self._ckpt.save(path, payload)
            self._wait()

    # ----------------------------------------------------------------- #
    def _meta(self) -> Dict[str, Any]:
        if self._meta_path.exists():
            return json.loads(self._meta_path.read_text())
        return {"checkpoints": [], "best": {}}

    def _write_meta(self, meta):
        self._meta_path.write_text(json.dumps(meta, indent=2))

    # ----------------------------------------------------------------- #
    def save(
        self,
        state: TrainState,
        epoch: int,
        last_task: str,
        metrics: Optional[Dict[str, float]] = None,
    ) -> str:
        name = f"epoch{epoch:04d}_{last_task}"
        path = self.dir / name
        self._save_slot(name, jax.device_get(state))
        meta = self._meta()
        meta["checkpoints"].append(
            {"name": name, "epoch": epoch, "last_task": last_task,
             "metrics": {k: float(v) for k, v in (metrics or {}).items()}}
        )
        # retention: keep the newest `keep`
        while len(meta["checkpoints"]) > self.keep:
            old = meta["checkpoints"].pop(0)
            old_path = self.dir / old["name"]
            best_names = {b["name"] for b in meta["best"].values()}
            if old_path.exists() and old["name"] not in best_names:
                shutil.rmtree(old_path)
        self._write_meta(meta)
        return str(path)

    def update_best(self, task: str, monitor: str, value: float, mode: str,
                    state: TrainState, epoch: int) -> bool:
        """Track per-task best by monitor (reference ModelCheckpoint analogue,
        round_robin_trainer.py:150-184). Returns True if improved.

        Best checkpoints are SLIM — params + batch stats only, no optimizer
        moments: they exist for model selection/deployment, and the full
        ~2 GB state made the per-improvement save dominate early task-epoch
        wall clock (measured ~45s each, round 4). Resume continues from the
        full per-epoch combined checkpoints; restoring from a best gives
        fresh optimizer state (the reference's resume path equally ignores
        its ModelCheckpoint files, round_robin_trainer.py:375-393)."""
        meta = self._meta()
        best = meta["best"].get(task)
        better = (
            best is None
            or (mode == "max" and value > best["value"])
            or (mode == "min" and value < best["value"])
        )
        if better:
            name = f"best_{task}"
            payload = {"params": jax.device_get(state.params),
                       "batch_stats": jax.device_get(state.batch_stats)}
            self._save_slot(name, payload)
            meta["best"][task] = {"value": float(value), "monitor": monitor,
                                  "epoch": epoch, "name": name, "slim": True}
            self._write_meta(meta)
        return better

    # ----------------------------------------------------------------- #
    def _committed_dirs(self, pattern: str):
        """Checkpoint dirs on disk that finished committing — orbax stages
        saves in ``<name>.orbax-checkpoint-tmp-*`` and renames on commit, so
        anything matching ``*tmp*`` is a torn write and must be skipped."""
        return sorted(
            p for p in self.dir.glob(pattern)
            if p.is_dir() and "tmp" not in p.name
        )

    def latest(self) -> Optional[Tuple[str, Dict[str, Any]]]:
        """Newest checkpoint: meta.json's list, falling back to a disk scan.

        The fallback covers the kill-during-first-save failure mode observed
        in round 3 (runs/r3_round_robin_convergence/phase2_resume*.log): a
        SIGKILL between ``update_best``'s commit and the first ``save``'s
        meta write leaves ``best_<task>`` on disk plus a ``*-tmp`` staging
        dir, while ``meta["checkpoints"]`` is still empty — resume must use
        what's really on disk, newest ``epoch*`` first, then ``best_*``,
        never ``*tmp*``."""
        meta = self._meta()
        if meta["checkpoints"]:
            entry = meta["checkpoints"][-1]
            # a torn meta write (listed but deleted dir) falls through to disk
            if (self.dir / entry["name"]).is_dir():
                return str(self.dir / entry["name"]), entry
        epochs = self._committed_dirs("epoch*")
        if epochs:
            p = epochs[-1]  # names are epoch%04d_<task> — sort == recency
            stem = p.name[len("epoch"):]
            num, _, task = stem.partition("_")
            entry = {"name": p.name, "epoch": int(num), "last_task": task}
            return str(p), entry
        bests = self._committed_dirs("best_*")
        if bests:
            by_name = {b["name"]: dict(b, last_task=t)
                       for t, b in meta["best"].items()}
            ranked = sorted(
                bests, key=lambda p: by_name.get(p.name, {}).get("epoch", -1)
            )
            p = ranked[-1]
            return str(p), by_name.get(p.name, {"name": p.name})
        return None

    def has_restorable(self) -> bool:
        """True iff ``restore(target)`` with no path can succeed — the
        decision drivers must use for ``--resume-checkpoint latest`` (a bare
        glob also sees ``*-tmp`` staging dirs and retries a doomed resume)."""
        return self.latest() is not None

    def restore(self, target: TrainState, path: Optional[str] = None) -> Tuple[TrainState, Dict[str, Any]]:
        """Restore into the structure of ``target`` (an abstract or concrete
        TrainState)."""
        if path is None:
            latest = self.latest()
            if latest is None:
                raise FileNotFoundError(f"no checkpoints under {self.dir}")
            path, entry = latest
        else:
            p = Path(path)
            # bare checkpoint names (the reference CLI convention) resolve
            # against the manager's directory
            if not p.is_absolute() and not p.exists():
                p = self.dir / p
            # recover epoch/last_task bookkeeping for the named checkpoint —
            # without it resume silently restarts from epoch 0. best_* names
            # live in meta["best"], not meta["checkpoints"] (advisor finding).
            meta = self._meta()
            entry = next(
                (e for e in meta["checkpoints"] if e["name"] == p.name), None
            )
            if entry is None:
                entry = next(
                    (
                        {"name": b["name"], "epoch": b["epoch"], "last_task": task}
                        for task, b in meta["best"].items()
                        if b["name"] == p.name
                    ),
                    {},
                )
            path = p
        p = Path(path).absolute()
        try:
            restored = self._ckpt.restore(p, target)
        except Exception:
            # slim (best_*) checkpoint: params + batch_stats only — restore
            # those into the target, keep its (fresh) optimizer states
            slim = self._ckpt.restore(
                p, {"params": target.params, "batch_stats": target.batch_stats}
            )
            restored = target.replace(params=slim["params"],
                                      batch_stats=slim["batch_stats"])
        return restored, entry
