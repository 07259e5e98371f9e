from prpe_tpu.parallel import distributed
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
    "distributed",
    "make_param_shardings",
    "replicated",
    "shard_batch",
]
