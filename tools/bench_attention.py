"""Device-time A/B of ViT attention formulations on the live chip.

Round-2 cascade profile (tools/profile_cascade.py): the attention einsums +
fp32 softmax account for ~11 ms of the 105 ms cascade step (QK 4.6 ms,
AV 4.2 ms, softmax 2.4 ms, q/k/v head reshapes ~2 ms) at ~10% MFU — the
(B,H,T,T) tensor round-trips HBM between every stage. This measures the
full ViTPose forward (cascade pose-stage shape: b=128, 256x192, bf16) under
each PRPE_ATTN_MODE so we keep the fastest (same methodology as
tools/bench_vit_ln.py: each mode in a fresh subprocess, profiler trace
device-time totals — wall clock through the axon relay is unreliable).

Usage: python tools/bench_attention.py [mode ...]
"""

import collections
import glob
import gzip
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ["einsum", "einsum_bf16sm", "pallas", "pallas_unrolled", "pallas_bh",
         "pallas_packed", "pallas_lnfused"]


def run_one(mode: str, batch: int = 128, iters: int = 10) -> None:
    os.environ["PRPE_ATTN_MODE"] = mode
    import jax
    import jax.numpy as jnp

    from prpe_tpu.nn.vit import ViTPose

    model = ViTPose(dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.key(1), (batch, 256, 192, 3)).astype(
        jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 256, 192, 3)))
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    out = fwd(variables, x)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/prpe_attn_trace_{mode}"
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = fwd(variables, x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    fs = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(fs[-1]) as f:
        t = json.load(f)
    tot = 0.0
    attn_us = collections.defaultdict(float)
    for e in t["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args", {})
        if "hlo_category" not in a:
            continue
        tot += e["dur"] / iters
        nm = e["name"]
        if any(s in nm for s in ("dot", "softmax", "custom-call", "fusion")):
            pass  # category detail below
        if "custom" in a.get("hlo_category", ""):
            attn_us["pallas"] += e["dur"] / iters
    print(f"MODE {mode:16s} vitpose fwd total {tot/1000:7.3f} ms/step"
          + (f"   pallas custom {attn_us['pallas']/1000:6.3f} ms"
             if attn_us["pallas"] else ""))


if __name__ == "__main__":
    modes = sys.argv[1:] or MODES
    if os.environ.get("_PRPE_ATTN_CHILD"):
        run_one(os.environ["_PRPE_ATTN_CHILD"])
    else:
        for m in modes:
            env = dict(os.environ, _PRPE_ATTN_CHILD=m)
            r = subprocess.run([sys.executable, __file__], env=env)
            if r.returncode != 0:
                print(f"MODE {m}: FAILED rc={r.returncode}")
