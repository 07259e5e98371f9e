"""Device-time profiler for the cascade benchmark path.

Wall-clock timings through the axon TPU relay are UNRELIABLE (dispatches
pipeline and `block_until_ready` can return before the device drains — the
same dual-YOLO program has "measured" both 1.2 ms and 12.4 ms walltime in
one session). The only trustworthy numbers come from `jax.profiler` device
traces. This tool captures one and aggregates per-op device time by HLO
category, source line, and module.

Usage (from the repo root, on the TPU):
    python tools/profile_cascade.py [batch]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from prpe_tpu.core.config import CascadeConfig, DetectionConfig, PoseConfig
from prpe_tpu.infer.cascade import CascadeModel, build_cascade_runner

TRACE_DIR = "/tmp/prpe_cascade_trace"


def main(batch: int = 128, size: int = 640, iters: int = 5) -> None:
    model = CascadeModel(detection=DetectionConfig(), pose_cfg=PoseConfig(),
                         dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k, a, b, c: model.init(k, a, b, c, method="init_all")
    )(jax.random.key(0), jnp.zeros((1, size, size, 3)),
      jnp.zeros((1, 112, 112, 3)), jnp.zeros((1, 256, 192, 3)))
    runner = build_cascade_runner(
        model, CascadeConfig(max_persons=8, max_faces=8, match_threshold=0.3),
        pose_capacity=batch)
    images = jax.random.uniform(
        jax.random.key(1), (batch, size, size, 3)).astype(jnp.bfloat16)
    gallery = jnp.zeros((32, 512))

    out = runner(variables, images, gallery)
    jax.block_until_ready(out)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(iters):
        out = runner(variables, images, gallery)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    fs = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(fs[-1]) as f:
        t = json.load(f)
    bycat = collections.Counter()
    bysrc = collections.Counter()
    bymod = collections.Counter()
    top = collections.Counter()
    args = {}
    tot = 0.0
    for e in t["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args", {})
        if "hlo_category" not in a:
            continue
        d = e["dur"] / iters
        tot += d
        bycat[a["hlo_category"]] += d
        src = re.sub(r".*/site-packages/", "", a.get("source", "?"))
        bysrc[(a["hlo_category"], src)] += d
        top[e["name"]] += d
        args[e["name"]] = a
        mod = "?"
        for fr in a.get("source_stack", "").split("\n"):
            m = re.search(r"prpe_tpu/(?:nn|ops|infer)/(\w+)\.py", fr)
            if m:
                mod = m.group(1)
                break
        bymod[mod] += d

    print(f"total device {tot/1000:.2f} ms/step "
          f"({batch} imgs -> {batch/(tot/1e6):.0f} img/s device-bound)\n")
    print("-- by HLO category --")
    for c, d in bycat.most_common(10):
        print(f"{d/1000:8.2f} ms  {c}")
    print("\n-- by module --")
    for k, d in bymod.most_common(12):
        print(f"{d/1000:8.2f} ms  {k}")
    print("\n-- by source line --")
    for (c, s), d in bysrc.most_common(15):
        print(f"{d/1000:8.3f} ms  {c[:20]:20s} {s}")
    print("\n-- top ops --")
    for k, d in top.most_common(12):
        print(f"{d/1000:7.3f} ms {k[:26]:26s} {args[k]['long_name'][:110]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
