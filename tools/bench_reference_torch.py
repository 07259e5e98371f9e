"""Measured reference baseline: the reference's component stack in torch.

Round-1 verdict: ``bench.py``'s ``vs_baseline`` denominator was a documented
*estimate*. The reference publishes no numbers (BASELINE.md) and no GPU
exists in this environment, so the measurable baseline is the reference
component stack — torch 2.x eager, fp32, CPU — on the *same host* that runs
the prpe_tpu CPU path. The torch modules are the clean-room transcriptions
from tests/test_porting_yolo_irnet.py (behavioral spec:
reference training/yolopt/nets/nn.py, libs/net_adaface.py) plus HF
ViTPose-B, at full scale:

  - YOLOv11-n @ 640^2  (person det; run twice in the cascade composite for
    the person+face pair, reference training/modify_models.py:183-205)
  - IR-50 @ 112^2      (face embedding, libs/net_adaface.py ir_50)
  - ViTPose-B @ 256x192 (usyd-community/vitpose-base-simple geometry)

The cascade composite assumes ONE face embed + ONE gated pose per image
(the BASELINE.json workload) and EXCLUDES the reference's host NMS / crop /
transfer overheads — i.e. it is an upper bound on reference throughput.

Usage:  python tools/bench_reference_torch.py [--iters N] [--batch B]
Writes a JSON summary to stdout; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def timeit(fn, iters, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def bench_torch(batch: int, iters: int):
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    from test_porting_yolo_irnet import TIRNet, TYolo

    results = {}
    with torch.inference_mode():
        yolo = TYolo(nc=80).eval()
        x = torch.randn(batch, 3, 640, 640)
        results["yolo11n_640"] = timeit(lambda: yolo(x), iters)

        ir50 = TIRNet(num_layers=50).eval()
        xf = torch.randn(batch, 3, 112, 112)
        results["ir50_112"] = timeit(lambda: ir50(xf), iters)

        from transformers import VitPoseConfig, VitPoseForPoseEstimation
        from transformers.models.vitpose_backbone import VitPoseBackboneConfig

        # ViTPose-B geometry (usyd-community/vitpose-base-simple):
        # ViT-B/16 encoder, 256x192 input, 17 keypoints, simple decoder
        bc = VitPoseBackboneConfig(
            num_hidden_layers=12, hidden_size=768, num_attention_heads=12,
            intermediate_size=3072, image_size=[256, 192], num_channels=3,
        )
        vitpose = VitPoseForPoseEstimation(
            VitPoseConfig(backbone_config=bc, num_labels=17)
        ).eval()
        xp = torch.randn(batch, 3, 256, 192)
        results["vitpose_b_256x192"] = timeit(lambda: vitpose(pixel_values=xp), iters)

    # cascade composite: person det + face det + 1 face embed + 1 pose,
    # per image (host NMS/crop/transfer excluded — favors the reference)
    per_img = (
        2 * results["yolo11n_640"] + results["ir50_112"]
        + results["vitpose_b_256x192"]
    ) / batch
    results["cascade_composite_img_per_sec"] = 1.0 / per_img
    return results


def bench_prpe_cpu(batch: int, iters: int):
    """Same-host prpe_tpu CPU path: the full jitted cascade (XLA CPU).

    Must run in a process where jax has NEVER touched the axon TPU relay —
    main() re-execs this in a scrubbed child (the torch phase imports the
    test transcription module, which imports prpe_tpu/jax and can latch the
    relay backend).
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

    from prpe_tpu.core.config import CascadeConfig, DetectionConfig, PoseConfig
    from prpe_tpu.infer.cascade import CascadeModel, build_cascade_runner

    model = CascadeModel(detection=DetectionConfig(), pose_cfg=PoseConfig(),
                         dtype=jnp.float32)
    img0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    face0 = jnp.zeros((1, 112, 112, 3), jnp.float32)
    pose0 = jnp.zeros((1, 256, 192, 3), jnp.float32)
    variables = jax.jit(
        lambda k, a, b, c: model.init(k, a, b, c, method="init_all")
    )(jax.random.key(0), img0, face0, pose0)
    runner = build_cascade_runner(
        model, CascadeConfig(max_persons=8, max_faces=8, match_threshold=0.3),
        pose_capacity=batch,
    )
    images = jax.random.uniform(jax.random.key(1), (batch, 640, 640, 3))
    gallery = jax.random.normal(jax.random.key(2), (32, 512))
    gallery = gallery / jnp.linalg.norm(gallery, axis=-1, keepdims=True)

    def run():
        jax.block_until_ready(runner(variables, images, gallery))

    dt = timeit(run, iters, warmup=1)
    return {"prpe_cascade_cpu_img_per_sec": batch / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--skip-prpe", action="store_true")
    ap.add_argument("--prpe-only", action="store_true",
                    help="internal: run only the prpe CPU bench (clean child)")
    args = ap.parse_args()

    if args.prpe_only:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        out = {k: round(v, 4)
               for k, v in bench_prpe_cpu(args.batch, args.iters).items()}
        print("PRPE_JSON " + json.dumps(out))
        return

    out = {"host_cpus": os.cpu_count(), "batch": args.batch}
    out["torch_eager_fp32_cpu"] = {
        k: (round(v, 4) if "img_per_sec" in k else round(v * 1000 / args.batch, 2))
        for k, v in bench_torch(args.batch, args.iters).items()
    }
    if not args.skip_prpe:
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--prpe-only",
             "--batch", str(args.batch), "--iters", str(args.iters)],
            env=env, capture_output=True, text=True, cwd=ROOT,
        )
        line = next((l for l in r.stdout.splitlines()
                     if l.startswith("PRPE_JSON ")), None)
        if line is None:
            raise RuntimeError(f"prpe child failed: {r.stderr[-2000:]}")
        out["prpe_xla_fp32_cpu"] = json.loads(line[len("PRPE_JSON "):])
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
