from prpe_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    make_param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "build_mesh",
    "make_param_shardings",
    "replicated",
    "shard_batch",
]
