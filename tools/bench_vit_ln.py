"""Device-time A/B of ViT LayerNorm formulations on the live chip.

The round-2 cascade profile shows 12 convert_reduce_fusion ops (the per-block
fp32 LayerNorm stats) at 2.003 ms each = 24 ms = 21% of cascade device time,
with a transposing {2,0,1} output layout. This tool measures the ViTPose
forward (the cascade's pose stage shape: b=128 crops, 256x192, bf16) under
each PRPE_LN_MODE variant so we can keep the fastest.

Usage: python tools/bench_vit_ln.py [mode ...]
"""

import collections
import glob
import gzip
import json
import os
import sys
import subprocess

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(mode: str, batch: int = 128, iters: int = 10) -> None:
    os.environ["PRPE_LN_MODE"] = mode
    import jax
    import jax.numpy as jnp
    from prpe_tpu.nn.vit import ViTPose

    model = ViTPose(dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.key(1), (batch, 256, 192, 3)).astype(jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 256, 192, 3)))
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    out = fwd(variables, x)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/prpe_ln_trace_{mode.replace('+', '_')}"
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = fwd(variables, x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    fs = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(fs[-1]) as f:
        t = json.load(f)
    tot = 0.0
    ln_us = 0.0
    for e in t["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args", {})
        if "hlo_category" not in a:
            continue
        tot += e["dur"] / iters
        nm = e["name"]
        if "convert_reduce" in nm or "reduce_fusion" in nm or "rsqrt" in nm:
            ln_us += e["dur"] / iters
    print(f"MODE {mode:14s} total {tot/1000:7.3f} ms/step   reduce-fusions {ln_us/1000:6.3f} ms")


if __name__ == "__main__":
    modes = sys.argv[1:] or ["barrier", "plain", "manual_f32", "manual_bf16"]
    if os.environ.get("PRPE_LN_CHILD"):
        run_one(os.environ["PRPE_LN_CHILD"])
    else:
        for m in modes:
            env = dict(os.environ, PRPE_LN_CHILD=m)
            subprocess.run([sys.executable, __file__], env=env, check=False)
