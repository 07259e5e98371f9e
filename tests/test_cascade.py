"""Gated-cascade tests on a tiny component stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-cascade compiles are multi-minute on CPU

from prpe_tpu.core.config import CascadeConfig, DetectionConfig, PoseConfig
from prpe_tpu.infer.cascade import CascadeModel, build_cascade_runner


@pytest.fixture(scope="module")
def cascade():
    det = DetectionConfig(pre_nms_top_k=64)
    pose = PoseConfig(input_size=(64, 48), heatmap_size=(16, 12),
                      vit_hidden=32, vit_layers=1, vit_heads=2)
    model = CascadeModel(detection=det, pose_cfg=pose, irnet_layers=18)
    # IRNet-50 is heavy for CPU tests; monkeypatch-free approach: init with
    # tiny spatial input is impossible (112 fixed), so keep batch tiny.
    img0 = jnp.zeros((1, 128, 128, 3))
    variables = model.init(
        jax.random.key(0), img0, jnp.zeros((1, 112, 112, 3)),
        jnp.zeros((1, 64, 48, 3)), method="init_all",
    )
    return model, variables


def test_cascade_shapes_and_gating(cascade):
    model, variables = cascade
    cfg = CascadeConfig(max_persons=4, max_faces=4, match_threshold=0.99)
    runner = build_cascade_runner(model, cfg, pose_capacity=3)
    images = jax.random.uniform(jax.random.key(1), (2, 128, 128, 3))
    gallery = jnp.zeros((2, 512))  # zero gallery -> cosine sim 0 -> no match
    res = runner(variables, images, gallery)

    assert res.persons.boxes.shape == (2, 4, 4)
    assert res.faces.boxes.shape == (2, 4, 4)
    assert res.face_identity.shape == (2, 4)
    assert res.pose_keypoints.shape == (3, 17, 2)
    # nothing matches the zero gallery at threshold .99 -> nothing gated
    assert not bool(res.person_gated.any())
    assert not bool(res.pose_valid.any())


def test_cascade_ungated_runs_pose(cascade):
    model, variables = cascade
    cfg = CascadeConfig(max_persons=4, max_faces=4, gate_pose=False)
    runner = build_cascade_runner(model, cfg, pose_capacity=3)
    images = jax.random.uniform(jax.random.key(2), (2, 128, 128, 3))
    gallery = jnp.zeros((1, 512))
    res = runner(variables, images, gallery)
    # with gating off, pose slots track valid person detections
    n_valid_persons = int(res.persons.valid.sum())
    assert int(res.pose_valid.sum()) == min(3, n_valid_persons)
    assert np.isfinite(np.asarray(res.pose_keypoints)).all()


def test_cascade_sharded_matches_single_device(cascade):
    """Data-parallel serving: batch sharded over an 8-device mesh produces
    the same results as the single-device program."""
    from prpe_tpu.core.config import MeshConfig
    from prpe_tpu.parallel.mesh import build_mesh

    model, variables = cascade
    cfg = CascadeConfig(max_persons=4, max_faces=4, gate_pose=False)
    images = jax.random.uniform(jax.random.key(5), (8, 128, 128, 3))
    gallery = jnp.zeros((2, 512))

    base = build_cascade_runner(model, cfg, pose_capacity=4)(
        variables, images, gallery)

    mesh = build_mesh(MeshConfig(model_parallel=1))
    sharded = build_cascade_runner(model, cfg, pose_capacity=4, mesh=mesh)(
        variables, images, gallery)

    for name, a, b in zip(base._fields[:1], [base.persons.boxes],
                          [sharded.persons.boxes]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(base.pose_keypoints),
                               np.asarray(sharded.pose_keypoints), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(base.pose_valid),
                                  np.asarray(sharded.pose_valid))


def test_cascade_uint8_input_matches_f32(cascade):
    """Packed uint8 pixels (data/packed.py disk format) through the cascade
    match host-normalized f32 input: /255 fuses into the on-device cast
    (infer/cascade.py uint8 branch), so the only difference is one ulp of
    x*(1/255) vs x/255."""
    model, variables = cascade
    cfg = CascadeConfig(max_persons=4, max_faces=4, match_threshold=0.3)
    runner = build_cascade_runner(model, cfg, pose_capacity=3)
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    gallery = jax.random.normal(jax.random.key(5), (2, 512))
    gallery = gallery / jnp.linalg.norm(gallery, axis=-1, keepdims=True)

    a = runner(variables, jnp.asarray(u8), gallery)
    b = runner(variables, jnp.asarray(u8.astype(np.float32) / 255.0), gallery)

    np.testing.assert_array_equal(np.asarray(a.persons.valid),
                                  np.asarray(b.persons.valid))
    np.testing.assert_array_equal(np.asarray(a.person_gated),
                                  np.asarray(b.person_gated))
    np.testing.assert_array_equal(np.asarray(a.face_identity),
                                  np.asarray(b.face_identity))
    np.testing.assert_allclose(np.asarray(a.persons.boxes),
                               np.asarray(b.persons.boxes), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.pose_keypoints),
                               np.asarray(b.pose_keypoints), atol=1e-3)


def test_cascade_pose_flip_test(cascade):
    """Flip-test averaging runs and differs from the single-pass result on
    random (asymmetric) weights. conf_threshold=0 makes detections
    deterministic — random-init scores need not cross the serving 0.25 gate
    on every host (round-1 flake)."""
    model, variables = cascade
    images = jax.random.uniform(jax.random.key(7), (2, 128, 128, 3))
    gallery = jnp.zeros((1, 512))
    base_cfg = CascadeConfig(max_persons=4, max_faces=4, gate_pose=False,
                             conf_threshold=0.0)
    flip_cfg = CascadeConfig(max_persons=4, max_faces=4, gate_pose=False,
                             conf_threshold=0.0, pose_flip_test=True)
    base = build_cascade_runner(model, base_cfg, pose_capacity=3)(
        variables, images, gallery)
    flip = build_cascade_runner(model, flip_cfg, pose_capacity=3)(
        variables, images, gallery)
    assert np.all(np.isfinite(np.asarray(flip.pose_keypoints)))
    # same slots selected; keypoints differ (random weights are asymmetric)
    np.testing.assert_array_equal(np.asarray(base.pose_valid),
                                  np.asarray(flip.pose_valid))
    assert bool(np.asarray(base.pose_valid).any()), (
        "conf_threshold=0 must yield detections (sigmoid scores > 0)")
    assert not np.allclose(np.asarray(base.pose_keypoints),
                           np.asarray(flip.pose_keypoints))


def test_cascade_face_budget_saturation_flag(cascade):
    """face_budget_saturated fires iff valid faces exceed the top-F budget."""
    model, variables = cascade
    images = jax.random.uniform(jax.random.key(9), (2, 128, 128, 3))
    gallery = jnp.zeros((1, 512))
    cfg = CascadeConfig(max_persons=4, max_faces=4, gate_pose=False,
                        conf_threshold=0.0, face_capacity=1)
    res = build_cascade_runner(model, cfg, pose_capacity=3)(
        variables, images, gallery)
    n_valid = int(res.faces.valid.sum())
    assert bool(res.face_budget_saturated) == (n_valid > 1)
    assert n_valid > 1  # conf 0 -> all 8 slots valid -> must be saturated

    roomy = CascadeConfig(max_persons=4, max_faces=4, gate_pose=False,
                          conf_threshold=0.0, face_capacity=8)
    res2 = build_cascade_runner(model, roomy, pose_capacity=3)(
        variables, images, gallery)
    assert not bool(res2.face_budget_saturated)


def test_cascade_stablehlo_export_roundtrip(cascade):
    """The whole single-jit cascade program serializes through jax.export
    (StableHLO) and the rehydrated artifact reproduces the live outputs —
    the serving-deployment story for the flagship path."""
    from jax import export as jexport

    from prpe_tpu.cli.export import register_result_serialization

    register_result_serialization()

    model, variables = cascade
    cfg = CascadeConfig(max_persons=4, max_faces=4, conf_threshold=0.0,
                        gate_pose=False)
    runner = build_cascade_runner(model, cfg, pose_capacity=3)
    images = jax.random.uniform(jax.random.key(11), (2, 128, 128, 3))
    gallery = jnp.zeros((1, 512))

    live = runner(variables, images, gallery)
    exp = jexport.export(jax.jit(runner))(variables, images, gallery)
    blob = exp.serialize()
    assert len(blob) > 0
    rehydrated = jexport.deserialize(blob)
    out = rehydrated.call(variables, images, gallery)
    np.testing.assert_allclose(
        np.asarray(out.pose_keypoints), np.asarray(live.pose_keypoints),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out.persons.valid), np.asarray(live.persons.valid))
