"""Model-level smoke tests: shapes, jit, per-task routing on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prpe_tpu.core.config import (
    AdaFaceConfig, CombinedModelConfig, DetectionConfig, PoseConfig,
)
from prpe_tpu.models.combined import CombinedModel
from prpe_tpu.nn.irnet import build_irnet
from prpe_tpu.nn.resnet import ResNetTrunk
from prpe_tpu.nn.vit import ViTPose
from prpe_tpu.nn.yolo import YOLO, decode_predictions


def tiny_config():
    """Small-but-structurally-complete config for CPU tests."""
    return CombinedModelConfig(
        image_size=128,
        backbone_stages=(1, 1, 1, 1),
        detection=DetectionConfig(adapter_size=(64, 64), pre_nms_top_k=64),
        face=AdaFaceConfig(arch="ir_18", num_classes=32),
        pose=PoseConfig(
            input_size=(64, 48), heatmap_size=(16, 12),
            vit_hidden=64, vit_layers=2, vit_heads=2,
        ),
    )


@pytest.fixture(scope="module")
def combined():
    cfg = tiny_config()
    model = CombinedModel(config=cfg)
    x = jnp.zeros((1, 128, 128, 3))
    labels = jnp.zeros((1,), jnp.int32)
    variables = model.init(jax.random.key(0), x, labels, method="init_all")
    return cfg, model, variables


def test_resnet_trunk_shape():
    m = ResNetTrunk()
    v = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    y = m.apply(v, jnp.zeros((2, 64, 64, 3)))
    assert y.shape == (2, 2, 2, 2048)


def test_yolo_shapes_and_decode():
    m = YOLO(nc=1, variant="n")
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.key(0), x)
    outs = m.apply(v, x)
    assert [tuple(o.shape) for o in outs] == [
        (2, 8, 8, 65), (2, 4, 4, 65), (2, 2, 2, 65)
    ]
    dec = decode_predictions(outs, nc=1)
    assert dec.shape == (2, 8 * 8 + 4 * 4 + 2 * 2, 5)
    # scores are probabilities
    assert float(dec[..., 4].min()) >= 0 and float(dec[..., 4].max()) <= 1


def test_irnet_embedding_normalized():
    m = build_irnet("ir_18")
    x = jax.random.normal(jax.random.key(1), (2, 112, 112, 3))
    v = m.init(jax.random.key(0), x)
    emb, norms = m.apply(v, x)
    assert emb.shape == (2, 512) and norms.shape == (2, 1)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), np.ones(2), rtol=1e-4
    )


def test_vitpose_shapes():
    m = ViTPose(image_size=(64, 48), hidden=64, layers=1, heads=2)
    x = jnp.zeros((2, 64, 48, 3))
    v = m.init(jax.random.key(0), x)
    hm = m.apply(v, x)
    # 64/16=4 (+pad adj) x4 -> 16; 48/16=3 x4 -> 12
    assert hm.shape == (2, 17, 16, 12)


def test_combined_all_tasks(combined):
    cfg, model, variables = combined
    x = jnp.zeros((2, 128, 128, 3))

    person = model.apply(variables, x, "person", method="detect")
    assert len(person) == 3 and person[0].shape[-1] == 65

    emb, norms = model.apply(variables, x, method="embed_face")
    assert emb.shape == (2, 512)

    logits = model.apply(
        variables, x, jnp.zeros((2,), jnp.int32), False, method="face_logits"
    )
    assert logits.shape == (2, cfg.face.num_classes)

    hm = model.apply(variables, x, method="pose")
    assert hm.shape == (2, 17, 16, 12)


def test_combined_task_dispatch_jits(combined):
    cfg, model, variables = combined
    x = jnp.zeros((1, 128, 128, 3))

    @jax.jit
    def pose_step(v, x):
        return model.apply(v, x, task="pose_estimation")

    assert pose_step(variables, x).shape == (1, 17, 16, 12)


def test_margin_stats_update_in_train_mode(combined):
    cfg, model, variables = combined
    x = jax.random.normal(jax.random.key(1), (2, 128, 128, 3))
    labels = jnp.zeros((2,), jnp.int32)
    _, mutated = model.apply(
        variables, x, labels, True, method="face_logits",
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)},
    )
    old = variables["batch_stats"]["margin_mean"]
    new = mutated["batch_stats"]["margin_mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_inference_bn_matches_flax_eval_bn():
    """inference_bn's folded scale+bias == flax BatchNorm(eval) numerically,
    and train mode still updates running stats identically."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from prpe_tpu.nn.common import ConvBN, inference_bn

    class Plain(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                                momentum=0.97, name="bn")(x)

    class Folded(nn.Module):
        @nn.compact
        def __call__(self, x):
            return inference_bn(
                nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             momentum=0.97, name="bn"), x, False)

    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 6))
    v = Plain().init(jax.random.key(1), x)
    v = jax.tree_util.tree_map(np.asarray, v)
    v["batch_stats"]["bn"]["mean"] = np.linspace(-1, 1, 6).astype(np.float32)
    v["batch_stats"]["bn"]["var"] = np.linspace(0.5, 2.0, 6).astype(np.float32)
    v["params"]["bn"]["scale"] = np.linspace(0.7, 1.3, 6).astype(np.float32)
    v["params"]["bn"]["bias"] = np.linspace(-0.2, 0.2, 6).astype(np.float32)
    a = Plain().apply(v, x)
    b = Folded().apply(v, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # train mode: ConvBN must still mutate running stats (the folding is
    # strictly an eval-path rewrite)
    m = ConvBN(8, 3, padding=1)
    vv = m.init(jax.random.key(2), x)
    _, mut = m.apply(vv, x, True, mutable=["batch_stats"])
    before = vv["batch_stats"]["bn"]["mean"]
    after = mut["batch_stats"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_fast_gelu_exact_in_fp32_close_in_bf16():
    """fast_gelu: fp32 is bit-exact erf GELU (porting parity paths);
    bf16 uses the tanh approximation, whose error must stay below bf16's
    own quantization noise."""
    from prpe_tpu.nn.common import fast_gelu

    x = jnp.linspace(-6.0, 6.0, 4097, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fast_gelu(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)),
    )

    xb = x.astype(jnp.bfloat16)
    got = np.asarray(fast_gelu(xb)).astype(np.float32)
    want = np.asarray(jax.nn.gelu(x, approximate=False))
    # tanh-approx worst-case absolute error ~3e-3 + bf16 rounding of the
    # output (|y| <= 6 here -> step <= 0.047)
    assert np.max(np.abs(got - want)) < 0.05
    # and in the bulk the two are indistinguishable after bf16 rounding
    mask = np.abs(x) < 1.0
    assert np.max(np.abs(got[mask] - want[mask])) < 0.01
