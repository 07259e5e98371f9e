"""Benchmark harness: face-gated pose cascade throughput on one TPU chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
All diagnostics go to stderr — one progress line per phase (probe / imports /
init / compile / measuring) with cumulative elapsed, so a driver-side timeout
tail is diagnosable (VERDICT r3: BENCH_r03 timed out with an empty tail).

The measured config is the BASELINE.json headline: detect persons + faces at
640^2 (YOLOv11-n x2), IR-50 embeddings on 112^2 face crops, cosine identity
gating, ViTPose-B on the matched 256x192 person crops — all inside ONE jitted
program on-device (see prpe_tpu/infer/cascade.py).

``vs_baseline``: the reference repo publishes no numbers and no reference
GPU exists in this environment (BASELINE.md), so the denominator is the
MEASURED throughput of the reference component stack — torch 2.x eager
fp32 on this host's CPU, same-architecture transcriptions at full scale
(2x YOLOv11-n 640^2 + IR-50 112^2 + ViTPose-B 256x192 per image, host
NMS/crop overhead excluded in the reference's favor) — captured by
tools/bench_reference_torch.py and recorded in BASELINE.md. The ratio is
therefore chip-vs-host-CPU, NOT chip-vs-GPU; for the same-hardware
framework comparison, the prpe XLA-CPU cascade on the identical host
measures 0.871 img/s vs torch's 0.687 (1.27x) — see BASELINE.md.

Deadline behavior: ``PRPE_BENCH_DEADLINE_S`` (default 480) is a soft wall-
clock budget measured from process start. The measuring loop runs in chunks
and emits the JSON from however many iterations completed when the deadline
passes, so a slow compile degrades the sample count instead of producing no
artifact at all.
"""

from __future__ import annotations

import json
import os
import sys
import time

# measured: tools/bench_reference_torch.py on this host (1 CPU core), 2026-08
# per-image ms — yolo11n_640: 341.03 x2, ir50_112: 323.78, vitpose_b: 449.94
REFERENCE_CASCADE_IMG_PER_SEC = 0.6869  # torch eager fp32 CPU composite

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _probe_backend(timeout_s: float = 120.0) -> bool:
    """Fail fast if the TPU relay is wedged: jax.devices() through a dead
    relay blocks in C++ forever (uninterruptible by SIGTERM) — observed
    2026-08-17 when a SIGKILLed client left a stale terminal claim. Probe
    in a child process we can kill."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    dry_run = "--dry-run" in argv
    deadline_s = float(os.environ.get("PRPE_BENCH_DEADLINE_S", "480"))

    if dry_run:
        # CPU-only smoke of the full code path (tiny geometry) — used by the
        # budget test so a regression in the JSON-emit path is caught in the
        # suite, not by a silent driver timeout (VERDICT r3 item 8).
        # sitecustomize registers the axon TPU plugin at interpreter start
        # whenever PALLAS_AXON_POOL_IPS is set (and jax binds JAX_PLATFORMS
        # at import), so in-process env edits are too late — re-exec with a
        # scrubbed environment, exactly like __graft_entry__.dryrun_multichip.
        if "jax" in sys.modules or os.environ.get("PALLAS_AXON_POOL_IPS"):
            if not os.environ.get("_PRPE_BENCH_CHILD"):
                import subprocess

                env = dict(os.environ)
                env["JAX_PLATFORMS"] = "cpu"
                env["_PRPE_BENCH_CHILD"] = "1"
                env.pop("PALLAS_AXON_POOL_IPS", None)
                env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
                env.pop("XLA_FLAGS", None)
                return subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--dry-run"],
                    env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
                ).returncode
        os.environ["JAX_PLATFORMS"] = "cpu"
    else:
        _log("probing TPU backend...")
        if not _probe_backend():
            _log("JAX backend unreachable (TPU relay wedged?) — refusing to hang")
            return 1
        _log("backend reachable; importing")
    # The fused MHSA Pallas kernel (ops/pallas/attention_kernel.py) in its
    # PACKED (B,T,C) formulation is measured FASTER than XLA's einsum
    # schedule at the ViTPose shape (33.3 vs 42.0 ms fwd @ b=128 bf16,
    # tools/bench_attention.py) and is the default (PRPE_ATTN_MODE=
    # pallas_packed, prpe_tpu/nn/vit.py); the older per-head layouts lost to
    # their HBM relayouts and stay selectable via PRPE_ATTN_MODE.

    import jax
    import jax.numpy as jnp

    from prpe_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from prpe_tpu.core.config import CascadeConfig, DetectionConfig, PoseConfig
    from prpe_tpu.infer.cascade import CascadeModel, build_cascade_runner

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # Serving-throughput configuration: batch 128 is the measured knee on one
    # v5e chip (img/s at batch 8/32/64/128/256 = 470/663/745/983/945 — the
    # small-channel YOLOv11-n layers are layout-bound at small batch and only
    # saturate the MXU with many images in flight). pose_capacity scales 1:1
    # with batch (average one gated person per image, the BASELINE.json
    # workload assumption).
    if dry_run:
        batch, image_size, pose_capacity, gallery_size = 2, 128, 2, 4
        model = CascadeModel(
            detection=DetectionConfig(pre_nms_top_k=64),
            pose_cfg=PoseConfig(input_size=(64, 48), heatmap_size=(16, 12),
                                vit_hidden=32, vit_layers=1, vit_heads=2),
            irnet_layers=18, dtype=dtype,
        )
        cascade_cfg = CascadeConfig(max_persons=4, max_faces=4,
                                    match_threshold=0.3)
        pose_hw = (64, 48)
    else:
        # batch 128 = the measured knee (re-swept on the round-3 program,
        # see README); PRPE_BENCH_BATCH overrides for sweeps
        batch = int(os.environ.get("PRPE_BENCH_BATCH", "128"))
        image_size, pose_capacity, gallery_size = 640, batch, 32
        model = CascadeModel(
            detection=DetectionConfig(), pose_cfg=PoseConfig(), dtype=dtype,
        )
        cascade_cfg = CascadeConfig(max_persons=8, max_faces=8,
                                    match_threshold=0.3)
        pose_hw = (256, 192)

    _log(f"backend={jax.default_backend()} dtype={jnp.dtype(dtype).name} "
         f"batch={batch}; initializing model...")
    key = jax.random.key(0)
    img0 = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    face0 = jnp.zeros((1, 112, 112, 3), jnp.float32)
    pose0 = jnp.zeros((1,) + pose_hw + (3,), jnp.float32)
    # jit: one compiled init program instead of per-primitive eager dispatch
    variables = jax.jit(
        lambda k, a, b, c: model.init(k, a, b, c, method="init_all")
    )(key, img0, face0, pose0)
    jax.block_until_ready(variables)
    _log("model initialized; building + compiling cascade runner...")

    runner = build_cascade_runner(model, cascade_cfg,
                                  pose_capacity=pose_capacity)

    # serve bf16 pixels: skips the on-device fp32->bf16 retile of the 640^2
    # batch (crop coordinate math stays fp32 inside prpe_tpu/ops/roi.py).
    # Measured-and-rejected round 5: raw uint8 input (the packed disk
    # format) benches 1205 vs 1233 img/s — the fused /255 cast+retile costs
    # more device time than bf16's 1.2 ms entry-layout copy; uint8 remains
    # the right choice for the HOST->DEVICE link, not for device residency.
    images = jax.random.uniform(
        jax.random.key(1), (batch, image_size, image_size, 3)
    ).astype(dtype)
    gallery = jax.random.normal(jax.random.key(2), (gallery_size, 512))
    gallery = gallery / jnp.linalg.norm(gallery, axis=-1, keepdims=True)

    # warmup / compile
    out = runner(variables, images, gallery)
    jax.block_until_ready(out)
    _log("compiled; measuring...")

    # chunked measurement under the soft deadline: emit whatever completed
    target_iters = 4 if dry_run else 20
    chunk = 1 if dry_run else 4
    done = 0
    t0 = time.perf_counter()
    while done < target_iters:
        for _ in range(chunk):
            out = runner(variables, images, gallery)
        jax.block_until_ready(out)
        done += chunk
        elapsed_total = time.perf_counter() - _T0
        _log(f"measured {done}/{target_iters} iters "
             f"({batch * done / (time.perf_counter() - t0):.0f} img/s)")
        if elapsed_total > deadline_s:
            _log(f"soft deadline {deadline_s:.0f}s hit — emitting partial "
                 f"result from {done} iters")
            break
    dt = time.perf_counter() - t0

    img_per_sec = batch * done / dt
    print(json.dumps({
        "metric": "face_gated_pose_cascade_640_throughput",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / REFERENCE_CASCADE_IMG_PER_SEC, 3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
