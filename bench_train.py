"""Training-throughput benchmark: device step time per task at the
reference config (batch 32 @ 640^2, bf16, branch-scope optimizers).

Prints ONE JSON line per task plus a summary line, e.g.
  {"metric": "train_step_pose_estimation", "value": 121.0, "unit": "images/sec", ...}

Unlike bench.py (the driver's cascade headline), this is the tracked
artifact for training-step performance (round-1 verdict: training had no
bench-style number). Device times come from `jax.profiler` traces — wall
clock through the TPU relay is unreliable.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TRACE_DIR = "/tmp/prpe_bench_train_trace"
TASKS = ("person_detection", "face_detection", "face_recognition",
         "pose_estimation")


def main(batch=32, size=640, iters=5):
    import jax
    import jax.numpy as jnp

    from prpe_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    from prpe_tpu.core.config import CombinedModelConfig, OptimConfig
    from prpe_tpu.data import synthetic
    from prpe_tpu.models.combined import CombinedModel
    from prpe_tpu.train.optim import build_optimizer
    from prpe_tpu.train.state import create_train_state
    from prpe_tpu.train.steps import make_train_step, mask_optimizer

    cfg = CombinedModelConfig(image_size=size, remat_backbone=True)
    model = CombinedModel(config=cfg, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, size, size, 3)),
                             jnp.zeros((1,), jnp.int32), method="init_all")
    )(jax.random.key(0))
    txs = {t: mask_optimizer(build_optimizer(OptimConfig(learning_rate=1e-3)), t)
           for t in TASKS}
    state = jax.jit(lambda v: create_train_state(v, txs))(variables)

    rng = np.random.default_rng(0)
    make = {
        "person_detection": lambda: synthetic.detection_batch(rng, batch, size, 16),
        "face_detection": lambda: synthetic.detection_batch(rng, batch, size, 16),
        "face_recognition": lambda: synthetic.face_batch(rng, batch, size, 1000),
        "pose_estimation": lambda: synthetic.pose_batch(rng, batch, size, 8),
    }
    steps, batches = {}, {}
    for t in TASKS:
        steps[t] = make_train_step(model, t, txs[t], cfg)
        batches[t] = {k: jnp.asarray(v) for k, v in make[t]().items()}
        state, m = steps[t](state, batches[t], jax.random.key(1))

    jax.profiler.start_trace(TRACE_DIR)
    for t in TASKS:
        for _ in range(iters):
            state, m = steps[t](state, batches[t], jax.random.key(2))
        jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()

    fs = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(fs[-1]) as f:
        tr = json.load(f)
    names, runs = {}, []
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"]["name"]
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in str(names.get(e.get("pid"), ""))
                and e["name"].startswith("jit__step")):
            runs.append((e["ts"], e["dur"]))
    runs.sort()
    # positional attribution (tasks ran sequentially and every step compiles
    # to a module named jit__step) is only valid when the trace holds exactly
    # iters events per task — a dropped/duplicated event would shift every
    # later task's window onto the wrong step times. Fail loudly instead.
    if len(runs) != len(TASKS) * iters:
        raise RuntimeError(
            f"trace has {len(runs)} jit__step executions, expected "
            f"{len(TASKS) * iters} ({len(TASKS)} tasks x {iters} iters) — "
            "per-task attribution would be wrong; rerun the benchmark")
    total_img_s = 0.0
    for i, t in enumerate(TASKS):
        chunk = runs[i * iters:(i + 1) * iters]
        ms = sum(d for _, d in chunk) / max(len(chunk), 1) / 1000
        img_s = batch / (ms / 1e3) if ms else 0.0
        total_img_s += img_s
        print(json.dumps({
            "metric": f"train_step_{t}", "value": round(img_s, 1),
            "unit": "images/sec", "device_ms_per_step": round(ms, 2),
            "batch": batch, "image_size": size,
        }))
    print(json.dumps({
        "metric": "train_steps_bs32_640_harmonic_summary",
        "value": round(total_img_s / len(TASKS), 1),
        "unit": "images/sec (mean over tasks)",
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         int(sys.argv[2]) if len(sys.argv) > 2 else 640)
