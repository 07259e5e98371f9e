"""Training-loop tests: per-task steps learn on synthetic data, the
round-robin orchestrator runs end-to-end with checkpointing + resume."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # per-task train-step compiles, minutes on CPU

import jax
import jax.numpy as jnp

from prpe_tpu.core.config import (
    DataConfig, OptimConfig, TaskConfig, TrainConfig,
)
from prpe_tpu.data import synthetic
from prpe_tpu.models.combined import CombinedModel
from prpe_tpu.train.optim import build_optimizer
from prpe_tpu.train.round_robin import RoundRobinTrainer
from prpe_tpu.train.state import create_train_state
from prpe_tpu.train.steps import make_eval_step, make_train_step
from tests.test_models import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = CombinedModel(config=cfg)
    x = jnp.zeros((1, 128, 128, 3))
    labels = jnp.zeros((1,), jnp.int32)
    variables = model.init(jax.random.key(0), x, labels, method="init_all")
    return cfg, model, variables


def _run_steps(model, cfg, variables, task, batch_fn, n_steps=6, lr=2e-3):
    tx = build_optimizer(OptimConfig(optimizer="adam", learning_rate=lr))
    # steps donate the state; keep the module-scoped fixture intact
    state = create_train_state(jax.tree_util.tree_map(jnp.copy, variables), {task: tx})
    step = make_train_step(model, task, tx, cfg)
    rng = np.random.default_rng(0)
    losses = []
    batch = {k: jnp.asarray(v) for k, v in batch_fn(rng).items()}
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    return losses, state


def test_detection_step_learns(setup):
    cfg, model, variables = setup
    fn = lambda rng: synthetic.detection_batch(rng, batch_size=2, image_size=128, max_gt=8)
    # lr 5e-4: the TAL-assigned detection loss is nonstationary (targets move
    # with the predictions) and one-batch overfit on the tiny model diverges
    # at the default 2e-3
    losses, _ = _run_steps(model, cfg, variables, "person_detection", fn,
                           n_steps=10, lr=5e-4)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_face_recognition_step_learns(setup):
    cfg, model, variables = setup
    fn = lambda rng: synthetic.face_batch(rng, batch_size=4, image_size=128,
                                          num_classes=cfg.face.num_classes)
    losses, state = _run_steps(model, cfg, variables, "face_recognition", fn, lr=1e-3)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # margin EMA stats must have moved off their init values
    assert float(state.batch_stats["margin_mean"]) != 20.0


def test_pose_step_learns(setup):
    cfg, model, variables = setup
    fn = lambda rng: synthetic.pose_batch(rng, batch_size=2, image_size=128, max_instances=4)
    losses, _ = _run_steps(model, cfg, variables, "pose_estimation", fn)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_trainable_scope_branch_freezes_trunk(setup):
    """Default trainable='branch' (reference parity: each task optimizer
    covers only its branch — face_detection/module_v2.py:507-517): one step
    moves branch params, leaves the backbone and sibling branches bit-exact,
    and optax.masked stores no moments for frozen leaves."""
    import optax

    from prpe_tpu.train.steps import mask_optimizer, trainable_mask

    cfg, model, variables = setup
    task = "person_detection"
    tx = mask_optimizer(
        build_optimizer(OptimConfig(optimizer="adam", learning_rate=1e-3)),
        task, "branch",
    )
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, variables), {task: tx})
    before = jax.device_get(state.params)
    step = make_train_step(model, task, tx, cfg)  # trainable defaults branch
    batch = {k: jnp.asarray(v) for k, v in synthetic.detection_batch(
        np.random.default_rng(0), 2, 128, 8).items()}
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.device_get(state.params)

    mask = trainable_mask(before, task, "branch")
    moved = frozen_same = 0
    for (path, b), m in zip(
        jax.tree_util.tree_leaves_with_path(before),
        jax.tree_util.tree_leaves(mask),
    ):
        a = after
        for p in path:
            a = a[p.key]
        if m:
            moved += int(not np.array_equal(a, b))
        else:
            np.testing.assert_array_equal(a, b, err_msg=jax.tree_util.keystr(path))
            frozen_same += 1
    assert moved > 10 and frozen_same > 10

    # masked optimizer carries no adam moments for frozen subtrees
    def count_moment_leaves(tree):
        return sum(
            int(np.ndim(l) > 0)
            for l in jax.tree_util.tree_leaves(tree)
        )

    masked_leaves = count_moment_leaves(state.opt_states[task])
    full_tx = build_optimizer(OptimConfig(optimizer="adam", learning_rate=1e-3))
    full_leaves = count_moment_leaves(full_tx.init(state.params))
    assert masked_leaves < full_leaves / 2


def test_param_group_scale_runs_vit_at_tenth_lr():
    """OptimConfig.param_group_scales scales one top-level subtree's update
    (reference pose AdamW param groups: ViT at 0.1x lr,
    pose_estimation/module.py:655-670)."""
    params = {"adapter": jnp.ones((4,)), "vit_pose": {"w": jnp.ones((4,))}}
    tx = build_optimizer(OptimConfig(
        optimizer="adamw", learning_rate=1e-2, weight_decay=0.0,
        param_group_scales=(("vit_pose", 0.1),),
    ))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(
        np.asarray(updates["vit_pose"]["w"]),
        0.1 * np.asarray(updates["adapter"]), rtol=1e-6)


def test_eval_steps_run(setup):
    cfg, model, variables = setup
    rng = np.random.default_rng(1)
    for task, fn in (
        ("face_detection", lambda: synthetic.detection_batch(rng, 2, 128, 8)),
        ("face_recognition", lambda: synthetic.face_batch(rng, 4, 128, cfg.face.num_classes)),
        ("pose_estimation", lambda: synthetic.pose_batch(rng, 2, 128, 4)),
    ):
        estep = make_eval_step(model, task, cfg)
        batch = {k: jnp.asarray(v) for k, v in fn().items()}
        metrics, preds = estep(variables, batch)
        assert np.isfinite(float(metrics["loss"]))
        if task == "face_detection":
            assert preds.boxes.shape[-1] == 4


def test_face_rec_eval_acc_is_margin_free(setup):
    """Eval `acc` must score the reference's validation rule — margin-FREE
    scaled-cosine argmax (face_recognition/module.py:119-157) — not the
    margin-penalized TRAINING logits.

    An earlier version of this port reused the margin-logit loss path at
    eval: AdaFace subtracts the margin on the TRUE class, so a
    correct-identity embedding can argmax to a wrong class and val_acc sat
    below chance while the model learned (observed at full scale:
    runs/r4_round_robin_convergence — train acc 0.74, val acc 0.0).
    Construct that exact case: an embedding equal to its class prototype
    (cosine 1.0) with a decoy prototype at cosine ~(1 - margin-effect) —
    margin-free argmax is right, margin argmax is wrong."""
    from prpe_tpu.ops import margin as margin_ops

    cfg, model, variables = setup
    rng = np.random.default_rng(3)
    batch = {k: jnp.asarray(v) for k, v in synthetic.face_batch(
        rng, 4, 128, cfg.face.num_classes).items()}
    estep = make_eval_step(model, "face_recognition", cfg)
    metrics, emb_out = estep(variables, batch)
    assert "acc" in metrics and "acc_margin" in metrics
    assert emb_out is not None  # embeddings feed the verification hook

    # the step's acc must equal an independently computed cosine argmax
    from prpe_tpu.data.packed import apply_image_norm
    from prpe_tpu.train.steps import TASK_IMAGE_NORM
    img = apply_image_norm(batch["image"], TASK_IMAGE_NORM["face_recognition"])
    emb, _ = model.apply(variables, img, False, method="embed_face")
    cos = margin_ops.normalized_cosine(
        np.asarray(variables["params"]["face_kernel"], np.float32),
        np.asarray(emb, np.float32))
    want = float((np.argmax(np.asarray(cos), -1)
                  == np.asarray(batch["label"])).mean())
    assert float(metrics["acc"]) == pytest.approx(want)

    # unit-level: margin penalization flips the argmax, cosine does not
    e = np.zeros((1, cfg.face.embedding_size), np.float32)
    e[0, 0] = 1.0
    # fill with tiny noise so no kernel column has zero norm (normalization
    # of a zero column is NaN and would hijack argmax)
    kernel = np.random.default_rng(0).normal(
        0, 1e-3, (cfg.face.embedding_size, cfg.face.num_classes)
    ).astype(np.float32)
    kernel[:, :2] = 0.0
    kernel[0, 0] = 1.0          # true class prototype == embedding
    kernel[0, 1] = 0.995        # decoy barely behind on cosine
    kernel[1, 1] = np.sqrt(1 - 0.995**2)
    cos1 = margin_ops._normalized_cosine(kernel, e, 1e-3)
    assert int(np.argmax(np.asarray(cos1), -1)[0]) == 0
    logits, _ = margin_ops.adaface_logits(
        jnp.asarray(kernel), jnp.asarray(e), jnp.asarray([[24.0]]),
        jnp.asarray([0]), margin_ops.MarginState.init(), update_stats=False)
    assert int(np.argmax(np.asarray(logits), -1)[0]) == 1


def test_detection_eval_boxes_in_image_frame(setup):
    """The combined model's YOLO runs on the adapter pseudo-image, so raw
    decoded boxes are in ADAPTER pixels — the eval step must rescale them to
    model-image pixels before the mAP hook compares them against gt scaled
    by image_size (the round-4 convergence run scored mAP50 == 0 at every
    epoch because of exactly this frame mismatch)."""
    from prpe_tpu.nn.yolo import decode_predictions
    from prpe_tpu.ops import nms as nms_ops
    from prpe_tpu.data.packed import apply_image_norm
    from prpe_tpu.train.steps import TASK_IMAGE_NORM

    cfg, model, variables = setup
    rng = np.random.default_rng(11)
    batch = {k: jnp.asarray(v) for k, v in synthetic.detection_batch(
        rng, batch_size=2, image_size=128, max_gt=cfg.detection.max_gt).items()}
    estep = make_eval_step(model, "person_detection", cfg)
    _, det_step = estep(variables, batch)

    # manual reference: same forward/decode/NMS in the adapter frame
    img = apply_image_norm(batch["image"], TASK_IMAGE_NORM["person_detection"])
    outs = model.apply(variables, img, "person", False, method="detect")
    d = cfg.detection
    manual = nms_ops.non_max_suppression(
        decode_predictions(outs, d.num_classes, d.reg_max),
        conf_threshold=d.conf_threshold, iou_threshold=d.iou_threshold,
        max_det=d.max_det, pre_nms_top_k=d.pre_nms_top_k, max_wh=d.max_wh)
    sx = batch["image"].shape[2] / d.adapter_size[1]
    sy = batch["image"].shape[1] / d.adapter_size[0]
    want = np.asarray(manual.boxes) * np.array([sx, sy, sx, sy], np.float32)
    np.testing.assert_allclose(
        np.asarray(det_step.boxes), want, rtol=1e-5, atol=1e-4)


def test_face_verification_hook():
    """Well-separated embeddings -> ver_acc ~1; label-shuffled -> ~chance."""
    from prpe_tpu.eval.verification import face_verification_hook

    rng = np.random.default_rng(0)
    n_cls, per = 8, 6
    protos = rng.normal(size=(n_cls, 32))
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    emb = np.repeat(protos, per, 0) + rng.normal(0, 0.05, (n_cls * per, 32))
    lab = np.repeat(np.arange(n_cls), per)
    sh = rng.permutation(len(lab))
    out = face_verification_hook()([(emb[sh], {"label": lab[sh]})])
    assert out["ver_acc"] > 0.9
    bad = face_verification_hook()(
        [(rng.normal(size=emb.shape), {"label": lab})])
    assert bad["ver_acc"] < 0.8


def test_round_robin_end_to_end(setup, tmp_path):
    cfg, model, variables = setup
    tasks = tuple(
        TaskConfig(name=n, optim=OptimConfig(learning_rate=1e-3),
                   monitor="val_loss", monitor_mode="min")
        for n in ("person_detection", "face_recognition", "pose_estimation")
    )
    tcfg = TrainConfig(total_epochs=2, checkpoint_dir=str(tmp_path / "ckpt"), tasks=tasks)
    loaders = {
        "person_detection": {
            "train": synthetic.make_loader("person_detection", batches_per_epoch=2,
                                           batch_size=2, image_size=128, max_gt=8),
            "val": synthetic.make_loader("person_detection", batches_per_epoch=1,
                                         batch_size=2, image_size=128, max_gt=8, seed=9),
        },
        "face_recognition": {
            "train": synthetic.make_loader("face_recognition", batches_per_epoch=2,
                                           batch_size=4, image_size=128,
                                           num_classes=cfg.face.num_classes),
            "val": synthetic.make_loader("face_recognition", batches_per_epoch=1,
                                         batch_size=4, image_size=128,
                                         num_classes=cfg.face.num_classes, seed=9),
        },
        "pose_estimation": {
            "train": synthetic.make_loader("pose_estimation", batches_per_epoch=2,
                                           batch_size=2, image_size=128, max_instances=4),
        },
    }
    trainer = RoundRobinTrainer(
        model, cfg, tcfg, jax.tree_util.tree_map(jnp.copy, variables),
        loaders, log_dir=str(tmp_path / "logs"),
    )
    out = trainer.train()
    hist = out["history"]
    assert len(hist) == 2 * 3  # epochs x tasks
    assert all(np.isfinite(h["train/loss"]) for h in hist)
    # val metrics present where loaders given
    assert any("val_loss" in h for h in hist)

    # checkpoints exist + resume restores epoch bookkeeping
    trainer2 = RoundRobinTrainer(
        model, cfg, tcfg, jax.tree_util.tree_map(jnp.copy, variables),
        loaders, log_dir=str(tmp_path / "logs2"),
    )
    trainer2.resume()
    assert trainer2.start_epoch == 2
    # restored params match trained params
    a = jax.tree_util.tree_leaves(out["state"].params)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # resume by BARE checkpoint name (the documented CLI convention) must
    # resolve against the checkpoint dir AND recover epoch bookkeeping.
    # The first checkpoint is (epoch 0, person_detection) — a MID-CYCLE
    # point: resume must continue epoch 0 with the remaining tasks, not
    # skip to epoch 1 (which would drop their epoch-0 training slice).
    import json as _json
    meta = _json.loads((tmp_path / "ckpt" / "meta.json").read_text())
    task_names = [t.name for t in tasks]
    # pick a retained checkpoint written mid-cycle (keep_checkpoints may
    # have trimmed the earliest epochs, so don't assume epoch 0 survives)
    e0 = next(e for e in meta["checkpoints"] if e["last_task"] != task_names[-1])
    trainer3 = RoundRobinTrainer(
        model, cfg, tcfg, jax.tree_util.tree_map(jnp.copy, variables),
        loaders, log_dir=str(tmp_path / "logs3"),
    )
    trainer3.resume(e0["name"])
    assert trainer3.start_epoch == e0["epoch"]
    assert trainer3._resume_task_index == task_names.index(e0["last_task"]) + 1
    # training to the end of that epoch runs exactly the REMAINING tasks
    out3 = trainer3.train(e0["epoch"] + 1)
    resumed_tasks = [h["task"] for h in out3["history"]]
    assert resumed_tasks == task_names[task_names.index(e0["last_task"]) + 1:]

    # resume by a best_* checkpoint name: its entry lives in meta["best"],
    # not meta["checkpoints"] — must still recover epoch bookkeeping
    # (advisor finding: silently restarted at epoch 0)
    best_task, best_entry = next(iter(meta["best"].items()))
    trainer4 = RoundRobinTrainer(
        model, cfg, tcfg, jax.tree_util.tree_map(jnp.copy, variables),
        loaders, log_dir=str(tmp_path / "logs4"),
    )
    trainer4.resume(best_entry["name"])
    if best_task == task_names[-1]:
        assert trainer4.start_epoch == best_entry["epoch"] + 1
    else:  # mid-cycle: continue the same epoch with the remaining tasks
        assert trainer4.start_epoch == best_entry["epoch"]
        assert trainer4._resume_task_index == task_names.index(best_task) + 1
