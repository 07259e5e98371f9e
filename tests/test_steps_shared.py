"""Shared detection program: person/face detection reuse one compiled step.

The two detection branches are built from the same DetectionConfig
(models/combined.py), matching the reference where both are nc=1 surgeries
of the SAME yolo11n.pt (training/modify_models.py:183-205) — so one XLA
program can serve both tasks via branch re-keying
(train/steps.py::make_shared_detection_train_step).
"""

import collections

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prpe_tpu.core.config import OptimConfig
from prpe_tpu.train.steps import (
    make_shared_detection_train_step, make_train_step, mask_optimizer,
    swap_detection_branches,
)


def test_swap_detection_branches_rekeys_and_is_involution():
    State = collections.namedtuple("State", ["mu", "count"])
    tree = {
        "params": {
            "yolo_person": {"w": np.ones(2)},
            "yolo_face": {"w": np.zeros(2)},
            "yolo_person_adapter": {"w": np.full(2, 2.0)},
            "yolo_face_adapter": {"w": np.full(2, 3.0)},
            "backbone": {"w": np.full(2, 4.0)},
        },
        "opt": State(mu={"yolo_person": {"w": np.ones(1)},
                         "yolo_face": {"w": np.zeros(1)},
                         "yolo_person_adapter": {"w": np.ones(1)},
                         "yolo_face_adapter": {"w": np.zeros(1)}},
                     count=np.zeros(())),
    }
    s = swap_detection_branches(tree)
    np.testing.assert_array_equal(s["params"]["yolo_person"]["w"], 0.0)
    np.testing.assert_array_equal(s["params"]["yolo_face"]["w"], 1.0)
    np.testing.assert_array_equal(s["params"]["yolo_person_adapter"]["w"], 3.0)
    np.testing.assert_array_equal(s["params"]["yolo_face_adapter"]["w"], 2.0)
    np.testing.assert_array_equal(s["params"]["backbone"]["w"], 4.0)
    assert isinstance(s["opt"], State)
    np.testing.assert_array_equal(s["opt"].mu["yolo_person"]["w"], 0.0)
    # involution: swapping twice restores the original values everywhere
    ss = swap_detection_branches(s)
    for a, b in zip(jax.tree_util.tree_leaves(ss), jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(a, b)


def test_swap_leaves_trees_without_both_branches_alone():
    """A dict that doesn't contain the full swap set (e.g. a masked opt
    subtree) must keep its keys."""
    tree = {"yolo_person": {"w": np.ones(2)}, "backbone": {"w": np.zeros(2)}}
    assert set(swap_detection_branches(tree)) == set(tree)


@pytest.mark.slow
def test_shared_detection_step_matches_dedicated():
    """face_detection through person_detection's compiled program must be
    numerically identical to its own dedicated compile — params, batch
    stats, optimizer state, and metrics."""
    from prpe_tpu.data import synthetic
    from prpe_tpu.models.combined import CombinedModel
    from prpe_tpu.train.optim import build_optimizer
    from prpe_tpu.train.state import create_train_state
    from tests.test_models import tiny_config

    cfg = tiny_config()
    model = CombinedModel(config=cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1,), jnp.int32), method="init_all",
    )
    txs = {
        t: mask_optimizer(
            build_optimizer(OptimConfig(optimizer="adam", learning_rate=1e-3)),
            t, "branch",
        )
        for t in ("person_detection", "face_detection")
    }

    def fresh_state():
        return create_train_state(
            jax.tree_util.tree_map(jnp.copy, variables), txs)

    batch = {k: jnp.asarray(v) for k, v in synthetic.detection_batch(
        np.random.default_rng(3), 2, 128, 8).items()}
    rng = jax.random.key(7)

    person_step = make_train_step(model, "person_detection", txs["person_detection"], cfg)
    dedicated = make_train_step(model, "face_detection", txs["face_detection"], cfg)
    shared = make_shared_detection_train_step(person_step)

    s_ded, m_ded = dedicated(fresh_state(), batch, rng)
    s_sh, m_sh = shared(fresh_state(), batch, rng)

    np.testing.assert_allclose(float(m_ded["loss"]), float(m_sh["loss"]), rtol=1e-6)
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_ded.params)),
        jax.tree_util.tree_leaves(jax.device_get(s_sh.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pa))
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_ded.batch_stats)),
        jax.tree_util.tree_leaves(jax.device_get(s_sh.batch_stats)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_ded.opt_states["face_detection"])),
        jax.tree_util.tree_leaves(jax.device_get(s_sh.opt_states["face_detection"])),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    # the person slots must be untouched by the shared face step
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_sh.opt_states["person_detection"])),
        jax.tree_util.tree_leaves(jax.device_get(fresh_state().opt_states["person_detection"])),
    ):
        np.testing.assert_allclose(a, b)
