"""Device-time profiler for the round-robin train steps.

Same caveat as tools/profile_cascade.py: wall-clock through the TPU relay
is unreliable; only `jax.profiler` device traces are trustworthy.

Usage (from anywhere, on the TPU):
    python tools/profile_train.py [batch] [image_size] [task ...]

Defaults profile the reference training config (batch 32 @ 640^2,
reference round_robin_trainer.py:400-407) in bf16 with backbone remat —
the same configuration `prpe_tpu.cli.train` uses.
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
import numpy as np

from prpe_tpu.core.config import CombinedModelConfig, OptimConfig
from prpe_tpu.data import synthetic
from prpe_tpu.models.combined import CombinedModel
from prpe_tpu.train.optim import build_optimizer
from prpe_tpu.train.state import create_train_state
from prpe_tpu.train.steps import make_train_step, mask_optimizer

TRACE_DIR = "/tmp/prpe_train_trace"
ALL_TASKS = ("person_detection", "face_detection", "face_recognition",
             "pose_estimation")


def main(batch=32, size=640, tasks=ALL_TASKS, iters=3):
    cfg = CombinedModelConfig(image_size=size, remat_backbone=True)
    model = CombinedModel(config=cfg, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, size, size, 3)),
                             jnp.zeros((1,), jnp.int32), method="init_all")
    )(jax.random.key(0))
    # branch-scope optimizers, matching bench_train.py / the reference's
    # per-task optimizers (frozen trunk => XLA drops the backbone backward)
    txs = {t: mask_optimizer(build_optimizer(OptimConfig(learning_rate=1e-3)), t)
           for t in tasks}
    state = jax.jit(lambda v: create_train_state(v, txs))(variables)

    rng = np.random.default_rng(0)
    make = {
        "person_detection": lambda: synthetic.detection_batch(rng, batch, size, 16),
        "face_detection": lambda: synthetic.detection_batch(rng, batch, size, 16),
        "face_recognition": lambda: synthetic.face_batch(rng, batch, size, 1000),
        "pose_estimation": lambda: synthetic.pose_batch(rng, batch, size, 8),
    }
    steps, batches = {}, {}
    for t in tasks:
        steps[t] = make_train_step(model, t, txs[t], cfg)
        batches[t] = {k: jnp.asarray(v) for k, v in make[t]().items()}
        state, m = steps[t](state, batches[t], jax.random.key(1))
        print(f"compiled {t}: loss={float(m['loss']):.4f}", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for t in tasks:
        for _ in range(iters):
            state, m = steps[t](state, batches[t], jax.random.key(2))
        jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()

    fs = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(fs[-1]) as f:
        tr = json.load(f)
    names, runs = {}, []
    bysrc = collections.Counter()
    bycat = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"]["name"]
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args", {})
        if ("TPU" in str(names.get(e.get("pid"), ""))
                and e["name"].startswith("jit__step")):
            runs.append((e["ts"], e["dur"]))
        if "hlo_category" in a:
            bycat[a["hlo_category"]] += e["dur"]
            src = re.sub(r".*/site-packages/", "", a.get("source", "?"))
            bysrc[(a["hlo_category"], src)] += e["dur"]
    runs.sort()
    for i, t in enumerate(tasks):
        chunk = runs[i * iters:(i + 1) * iters]
        if chunk:
            ms = sum(d for _, d in chunk) / len(chunk) / 1000
            print(f"{t:18s} {ms:8.2f} ms/step ({batch / (ms / 1e3):.0f} img/s)")
    print("\n-- by HLO category (all steps) --")
    for c, d in bycat.most_common(8):
        print(f"{d/1000:9.2f} ms  {c}")
    print("\n-- by source line --")
    for (c, s), d in bysrc.most_common(15):
        print(f"{d/1000:9.2f} ms  {c[:20]:20s} {s}")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    tasks = tuple(sys.argv[3:]) or ALL_TASKS
    main(batch, size, tasks)
