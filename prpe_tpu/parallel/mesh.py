"""Device mesh construction and sharding rules.

The reference's only parallelism is DDP over NCCL with DistributedSampler +
SyncBatchNorm (reference: training/yolopt/main.py:46-60,271-277). The
TPU-native design subsumes and generalizes it:

  * a 2-axis ``Mesh`` — ``data`` (batch parallelism over ICI; gradients
    reduce via the collectives XLA inserts for the global-mean loss, exactly
    DDP's allreduce) and ``model`` (tensor parallelism for the AdaFace
    512 x 85742 classifier, whose class dimension shards so each chip holds
    1/mp of the prototype matrix and the cross-entropy's log-sum-exp becomes
    an ICI psum)
  * batch-norm statistics are global means under jit + batch sharding, which
    *is* SyncBatchNorm — no separate wrapper needed
  * per-host input sharding replaces DistributedSampler (see
    prpe_tpu/data/pipeline.py)

Everything uses `jax.jit` + `NamedSharding` constraints (GSPMD) rather than
hand-written collectives: the models are small enough that XLA's sharding
propagation is optimal, and the code stays single-program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prpe_tpu.core.config import MeshConfig


def build_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    if cfg.data_parallel == -1:
        dp = n // mp
    else:
        dp = cfg.data_parallel
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Constrain every array in a batch pytree to batch-dim sharding."""
    s = batch_sharding(mesh)

    def _c(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.lax.with_sharding_constraint(x, s)
        return x

    return jax.tree_util.tree_map(_c, batch)


def make_param_shardings(mesh: Mesh, params: Any) -> Any:
    """Sharding tree for the parameter pytree.

    Policy: the AdaFace classifier kernel (*face_kernel*, (E, C)) shards its
    class dimension over the ``model`` axis; everything else (convs, norms,
    small dense layers) replicates — at these model scales replication is the
    bandwidth-optimal layout and keeps all matmuls local.
    """
    model_axis = mesh.axis_names[1]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = []
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "face_kernel" in names and getattr(leaf, "ndim", 0) == 2:
            shardings.append(NamedSharding(mesh, P(None, model_axis)))
        else:
            shardings.append(NamedSharding(mesh, P()))
    return jax.tree_util.tree_unflatten(treedef, shardings)
