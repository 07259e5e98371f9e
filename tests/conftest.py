"""Test config: force an 8-fake-device CPU platform before JAX initializes.

This is the TPU-world substitute for multi-node testing without a cluster
(the reference's DDP path is untested in-repo; we do better): every sharding
test runs against a real 8-device mesh of host CPU devices.
"""

import os

# The deployment env pre-sets JAX_PLATFORMS to the TPU platform; tests must
# override (not setdefault) to get the 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# persistent XLA compile cache: repeated suite runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
