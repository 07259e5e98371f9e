"""Multi-host bootstrap: the TPU-native replacement for the reference's
``torch.distributed.init_process_group(backend='nccl', init_method='env://')``
(reference: training/yolopt/main.py:271-277, teardown :297-298).

On TPU pods there is no NCCL and no per-process device binding to manage:
``jax.distributed.initialize()`` wires every host into one runtime, after
which ``jax.devices()`` spans the whole slice and the (data, model) mesh from
:mod:`prpe_tpu.parallel.mesh` covers all chips. Collectives ride ICI within a
slice and DCN across slices — chosen by XLA from the mesh layout, not by a
communication backend the framework has to own.

The reference reads ``LOCAL_RANK`` / ``WORLD_SIZE`` from the environment
(main.py:271-273); the equivalents here are the TPU runtime's own coordinator
variables, or explicit arguments for CPU/GPU fleets:

    from prpe_tpu.parallel import distributed
    distributed.initialize()            # TPU pod: fully automatic
    distributed.initialize(             # manual (tests / CPU fleets)
        coordinator_address="10.0.0.1:1234", num_processes=4, process_id=rank)

Per-host input sharding (the DistributedSampler replacement) keys off
``jax.process_index()`` / ``jax.process_count()`` — see
prpe_tpu/data/pipeline.py::LimitedSampler.
"""

from __future__ import annotations

import atexit
import logging
from typing import Optional

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
    *,
    shutdown_at_exit: bool = True,
) -> None:
    """Initialize the multi-host JAX runtime (idempotent).

    With no arguments, relies on the TPU runtime's automatic coordination
    (the common case on Cloud TPU / Borg slices). Arguments mirror
    ``jax.distributed.initialize`` for manual rendezvous.
    """
    global _initialized
    if _initialized:
        logger.debug("distributed runtime already initialized")
        return

    import jax

    if jax.process_count() > 1:
        # something (e.g. the launcher) already initialized the runtime
        _initialized = True
        return

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids

    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
        logger.info(
            "distributed runtime up: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except (ValueError, RuntimeError) as e:
        # single-process run (no coordinator reachable / already single-host):
        # everything still works on the local devices.
        logger.info("single-process mode (%s)", e)

    if shutdown_at_exit and _initialized:
        atexit.register(shutdown)


def shutdown() -> None:
    """Tear down the distributed runtime (reference parity:
    torch.distributed.destroy_process_group, yolopt/main.py:297-298)."""
    global _initialized
    if not _initialized:
        return
    import jax

    try:
        jax.distributed.shutdown()
    except Exception:  # pragma: no cover - double-shutdown at interpreter exit
        pass
    _initialized = False


def is_primary() -> bool:
    """True on the process that should write checkpoints / logs (the
    reference gates on LOCAL_RANK == 0, yolopt/main.py:34,135)."""
    import jax

    return jax.process_index() == 0


def sync_hosts(name: str = "barrier") -> None:
    """Cross-host barrier: blocks until every process reaches it."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
