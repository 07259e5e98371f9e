"""Shared JAX/XLA environment helpers for test + driver entry points.

One home for logic that must run BEFORE jax initializes its backend and is
needed by both ``tests/conftest.py`` and ``__graft_entry__.py`` (previously
duplicated verbatim in both — advisor finding, round 1).
"""

from __future__ import annotations


def known_xla_flags(*names: str) -> list:
    """Filter to XLA flag names the installed jaxlib actually knows.

    An unknown name in XLA_FLAGS is a *fatal* glog abort before any output
    (this bit us when jaxlib renamed
    xla_cpu_collective_call_warn_stuck_seconds) — probe the binaries instead
    of trusting the spelling. Scans each .so in chunks with an overlap window
    so we never materialize hundreds of MB in memory.
    """
    import glob
    import os

    try:
        import jaxlib

        targets = {n: n.encode() for n in names}
        found: set = set()
        overlap = max((len(b) for b in targets.values()), default=0)
        root = os.path.dirname(jaxlib.__file__)
        for so in glob.glob(os.path.join(root, "**", "*.so*"), recursive=True):
            if len(found) == len(targets):
                break
            with open(so, "rb") as f:
                tail = b""
                while True:
                    chunk = f.read(16 << 20)
                    if not chunk:
                        break
                    buf = tail + chunk
                    for n, b in targets.items():
                        if n not in found and b in buf:
                            found.add(n)
                    tail = buf[-overlap:] if overlap else b""
        return [n for n in names if n in found]
    except Exception:
        return []
