"""Profiling & tracing utilities.

Parity surface for the reference's observability hooks:
  * thop-based FLOPs/params ``profile()`` (reference: training/yolopt/main.py:242-256)
    -> XLA cost analysis of the lowered jitted computation
  * per-step GPU-memory logging (reference: training/yolopt/main.py:130)
    -> ``jax.local_devices()[0].memory_stats()``
  * nothing else in the reference; we add ``jax.profiler`` trace capture, the
    idiomatic TPU tool (SURVEY.md section 5 recommendation).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax


def count_flops(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """FLOPs + bytes of one call of ``fn`` via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }


def count_params(params: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def device_memory_stats(device=None) -> Dict[str, int]:
    device = device or jax.local_devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats or {})


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/prpe_trace"):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Simple images/sec meter with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._n_calls = 0
        self._items = 0
        self._t0: Optional[float] = None

    def step(self, n_items: int):
        self._n_calls += 1
        if self._n_calls == self.warmup:
            self._t0 = time.perf_counter()
            self._items = 0
        elif self._n_calls > self.warmup:
            self._items += n_items

    @property
    def items_per_sec(self) -> float:
        if self._t0 is None or self._items == 0:
            return 0.0
        return self._items / (time.perf_counter() - self._t0)
