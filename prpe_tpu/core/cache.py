"""Persistent XLA compile-cache setup shared by every entry point.

The round-robin trainer compiles ~10 large programs (4 train steps, 4 eval
steps, init, cascade); on a 1-core host that is minutes of wall clock. The
suite (tests/conftest.py), the driver dryrun (__graft_entry__) and the CLIs
all point at the same repo-local cache dir so any of them pre-warms the
others — and a kill + `--resume-checkpoint latest` restart (reference
semantics: training/round_robin_trainer.py:375-393) pays zero recompilation.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str:
    """Point jax at the repo-local persistent compile cache. Idempotent;
    must run before the first compilation (safe any time after import)."""
    import jax

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # PER-PLATFORM cache dir: an axon/TPU process routes compiles through the
    # remote compile service, which can also serve that process's host-side
    # CPU executables — AOT blobs built for the SERVICE machine's CPU. If
    # those land in the same dir the CPU test suite reads, every cache hit
    # fails with "machine feature +prefer-no-gather is not supported"
    # (observed round 5). Keying the dir by JAX_PLATFORMS isolates them.
    plat = (os.environ.get("JAX_PLATFORMS") or "device").split(",")[0] or "device"
    cache = os.path.join(root, ".cache", f"jax-{plat}")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache
