"""Checkpoint-manager regression tests for the resume failure modes.

The round-3 convergence run died on the exact sequence tested here
(runs/r3_round_robin_convergence/phase2_resume*.log): SIGKILL landed after
``update_best`` committed ``best_<task>`` but before the first ``save``
appended to ``meta["checkpoints"]``, leaving the dir with a best checkpoint
plus an orbax ``*-tmp`` staging dir and an empty meta list.  ``restore()``
then raised FileNotFoundError on every retry while the driver's bare
``glob("*")`` kept deciding resume=True.

Reference behavior being matched: resume always restores the newest state
actually on disk (training/round_robin_trainer.py:375-393).
"""

import json

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from prpe_tpu.train.checkpoint import CheckpointManager
from prpe_tpu.train.state import create_train_state


def tiny_state(value: float = 1.0):
    variables = {
        "params": {"w": jnp.full((4,), value), "b": jnp.zeros((2,))},
        "batch_stats": {"m": jnp.zeros((3,))},
    }
    tx = optax.adam(1e-3)
    return create_train_state(variables, {"person_detection": tx})


def test_resume_survives_kill_during_first_save(tmp_path):
    """The observed round-3 crash: best_* committed, meta['checkpoints']
    empty, an orbax tmp staging dir left behind — restore() must fall back
    to the best checkpoint instead of raising."""
    mgr = CheckpointManager(str(tmp_path), keep=3)
    state = tiny_state(7.0)
    assert mgr.update_best("person_detection", "val_loss", 0.5, "min",
                           state, epoch=3)

    # simulate the kill: save() never ran, so meta lists no checkpoints;
    # orbax staging of the in-flight epoch save is still on disk
    meta = json.loads((tmp_path / "meta.json").read_text())
    assert meta["checkpoints"] == []
    (tmp_path / "epoch0004_person_detection.orbax-checkpoint-tmp-123").mkdir()

    assert mgr.has_restorable()
    restored, entry = mgr.restore(tiny_state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)
    assert entry["epoch"] == 3
    assert entry["last_task"] == "person_detection"


def test_latest_skips_torn_meta_entry(tmp_path):
    """meta lists a checkpoint whose dir was deleted (torn meta write /
    manual cleanup) — latest() must fall through to what's on disk."""
    mgr = CheckpointManager(str(tmp_path), keep=3)
    mgr.save(tiny_state(1.0), epoch=0, last_task="person_detection")
    mgr.save(tiny_state(2.0), epoch=1, last_task="person_detection")

    # delete the newest dir but leave it listed in meta
    import shutil

    shutil.rmtree(tmp_path / "epoch0001_person_detection")
    path, entry = mgr.latest()
    assert entry["name"] == "epoch0000_person_detection"
    restored, _ = mgr.restore(tiny_state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 1.0)


def test_latest_prefers_newest_epoch_over_best(tmp_path):
    """Disk-scan fallback ranks epoch dirs (newest first) above best_*."""
    mgr = CheckpointManager(str(tmp_path), keep=3)
    mgr.update_best("person_detection", "val_loss", 0.5, "min",
                    tiny_state(9.0), epoch=0)
    mgr.save(tiny_state(1.0), epoch=0, last_task="person_detection")
    mgr.save(tiny_state(2.0), epoch=1, last_task="person_detection")
    # wipe the meta list entirely (worst-case torn write)
    meta = json.loads((tmp_path / "meta.json").read_text())
    meta["checkpoints"] = []
    (tmp_path / "meta.json").write_text(json.dumps(meta))

    path, entry = mgr.latest()
    assert entry == {"name": "epoch0001_person_detection", "epoch": 1,
                     "last_task": "person_detection"}
    restored, _ = mgr.restore(tiny_state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)


def test_has_restorable_false_when_only_tmp_dirs(tmp_path):
    """A kill before ANY commit leaves only staging dirs: the driver must
    see resume=False (the round-3 bare glob saw the tmp dir and retried a
    doomed --resume-checkpoint latest three times)."""
    mgr = CheckpointManager(str(tmp_path), keep=3)
    (tmp_path / "epoch0000_person_detection.orbax-checkpoint-tmp-9").mkdir()
    assert not mgr.has_restorable()
    with pytest.raises(FileNotFoundError):
        mgr.restore(tiny_state(0.0))


def test_empty_dir_not_restorable(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=3)
    assert not mgr.has_restorable()


def test_best_save_survives_stale_staging_dirs(tmp_path):
    """A SIGKILL mid-save leaves ``best_<task>.orbax-checkpoint-tmp*`` and
    sometimes a half-committed destination; the next ``update_best``/``save``
    of the same slot must clear them instead of dying in orbax's rename
    ("Cannot rename ...tmp. Destination exists" / "Destination already
    exists" — the two real resume crashes in
    runs/r5_round_robin_convergence/phase2_resume{,1}.log)."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    state = tiny_state(1.0)

    # fabricate the torn state: stale staging dir + stale destination dir
    for name in ("best_person_detection",
                 "best_person_detection.orbax-checkpoint-tmp-123",
                 "epoch0000_person_detection",
                 "epoch0000_person_detection.orbax-checkpoint-tmp-9"):
        d = tmp_path / "ckpt" / name
        d.mkdir(parents=True)
        (d / "junk").write_text("torn")

    assert mgr.update_best("person_detection", "val_loss", 0.5, "min",
                           state, epoch=0)
    mgr.save(state, 0, "person_detection")

    restored, entry = mgr.restore(tiny_state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(state.params["w"]))
    # no staging leftovers survive
    assert not list((tmp_path / "ckpt").glob("*tmp*"))
