"""Multi-chip sharding tests on the 8-fake-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prpe_tpu.core.config import MeshConfig
from prpe_tpu.parallel.mesh import (
    batch_sharding, build_mesh, make_param_shardings, replicated,
)


def test_mesh_shapes():
    mesh = build_mesh(MeshConfig(model_parallel=2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(data_parallel=3, model_parallel=2))


def test_param_sharding_rules():
    mesh = build_mesh(MeshConfig(model_parallel=2))
    params = {
        "face_kernel": jnp.zeros((16, 64)),
        "backbone": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 8))}},
    }
    sh = make_param_shardings(mesh, params)
    assert sh["face_kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["backbone"]["conv1"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_sharded_margin_matmul_matches_replicated():
    """AdaFace-style kernel matmul: class-sharded vs replicated must agree."""
    from prpe_tpu.ops import margin

    rng = np.random.default_rng(0)
    kernel = rng.normal(size=(32, 64)).astype(np.float32)
    emb = rng.normal(size=(8, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    norms = rng.uniform(5, 30, size=(8, 1)).astype(np.float32)
    labels = rng.integers(0, 64, size=(8,))
    state = margin.MarginState.init()

    def f(k, e):
        logits, _ = margin.adaface_logits(k, e, jnp.asarray(norms),
                                          jnp.asarray(labels), state)
        return logits

    ref = np.asarray(f(jnp.asarray(kernel), jnp.asarray(emb)))

    mesh = build_mesh(MeshConfig(model_parallel=2))
    ksh = jax.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "model"))
    esh = jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    k = jax.device_put(jnp.asarray(kernel), ksh)
    e = jax.device_put(jnp.asarray(emb), esh)
    out = np.asarray(jax.jit(f)(k, e))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_dryrun_multichip_full():
    """The driver's multi-chip validation: full train steps for all four
    tasks on a (4 data x 2 model) mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
