"""CLI surfaces: StableHLO export round-trip, inference checkpoints,
fresh-init model building (the air-gap fallback path)."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_export_stablehlo_roundtrip(tmp_path):
    from jax import export as jexport

    from prpe_tpu.cli.export import export_stablehlo

    def fn(w, x):
        return jnp.tanh(x @ w)

    w = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)
    x = jnp.ones((2, 4), jnp.float32)
    path = export_stablehlo(fn, (w, x), tmp_path / "m.stablehlo")
    assert path.stat().st_size > 0

    rehydrated = jexport.deserialize(path.read_bytes())
    got = rehydrated.call(w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fn(w, x)), atol=1e-6)


def test_save_inference_checkpoint_bf16(tmp_path):
    import orbax.checkpoint as ocp

    from prpe_tpu.cli.export import save_inference_checkpoint

    variables = {
        "params": {"w": jnp.ones((3, 3), jnp.float32)},
        "batch_stats": {"step": jnp.asarray(7, jnp.int32)},
    }
    path = save_inference_checkpoint(variables, tmp_path / "slim")
    restored = ocp.StandardCheckpointer().restore(path.absolute())
    assert restored["params"]["w"].dtype == jnp.bfloat16
    assert restored["batch_stats"]["step"] == 7  # ints untouched


def test_build_variables_fresh_init(tmp_path):
    """Missing component checkpoints degrade to fresh init (air-gap path)."""
    from prpe_tpu.cli.build_model import build_variables
    from tests.test_models import tiny_config

    tiny_cfg = tiny_config()
    model, variables = build_variables(
        pathlib.Path(tmp_path / "nonexistent"), tiny_cfg, log=lambda *a: None
    )
    assert "params" in variables and "batch_stats" in variables
    x = jnp.zeros((1, tiny_cfg.image_size, tiny_cfg.image_size, 3))
    hm = model.apply(
        {k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in variables.items()},
        x, False, method="pose",
    )
    assert np.all(np.isfinite(np.asarray(hm)))
