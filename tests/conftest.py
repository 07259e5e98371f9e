"""Test config: force an 8-fake-device CPU platform before JAX initializes.

This is the TPU-world substitute for multi-node testing without a cluster
(the reference's DDP path is untested in-repo; we do better): every sharding
test runs against a real 8-device mesh of host CPU devices.
"""

import os

# The deployment env pre-sets JAX_PLATFORMS to the TPU platform; tests must
# override (not setdefault) to get the 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon relay would route every XLA compile through a remote single-client
# service (slow; poisons the persistent cache with machine-mismatched AOT)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
from _xla_env import known_xla_flags as _known_xla_flags  # noqa: E402


flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# KEEP IN SYNC with __graft_entry__.dryrun_multichip: identical debug options
# mean identical compile-cache keys, so the suite pre-warms the dryrun.
# (8 virtual devices timeslicing a small host trip the default ~30s
# collective-stuck watchdogs on slow compiles; raise them when available.)
if "collective_call_terminate" not in flags:
    _WATCHDOGS = {
        "xla_cpu_collective_call_warn_stuck_timeout_seconds": 300,
        "xla_cpu_collective_call_terminate_timeout_seconds": 1800,
    }
    for name in _known_xla_flags(*_WATCHDOGS):
        flags += f" --{name}={_WATCHDOGS[name]}"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Belt and braces: if the axon sitecustomize already imported jax at
# interpreter start (PYTHONPATH=/root/.axon_site), JAX_PLATFORMS=axon was
# latched into jax.config before this file ran — the env write above is then
# a no-op and the whole suite silently runs on the remote TPU relay (slow,
# bf16-default matmuls break fp32 golden tests). Re-assert via the config.
jax.config.update("jax_platforms", "cpu")

# persistent XLA compile cache: repeated suite runs skip recompilation.
# Repo-local (survives across sessions, unlike /tmp) and SHARED with
# __graft_entry__.dryrun_multichip so the suite pre-warms the driver's
# multi-chip dryrun.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".cache", "jax-cpu")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
