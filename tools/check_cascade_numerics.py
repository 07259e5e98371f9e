"""Full-scale numerics verification (VERDICT r2 item 4).

Two checks, two subcommands:

  twins    torch-twin forward parity at REAL geometry, fp32 on CPU:
           YOLOv11-n eval decode @640^2, IR-50 embeddings @112^2, and
           ViTPose-B (full 12x768 HF model) @256x192 — the round-2 parity
           tests run these at reduced scale; this runs the checkpoint-scale
           shapes once and records max-abs drift.
  bf16     whole-cascade fp32 vs bf16 on the live TPU over ~100 synthetic
           scenes: gate-decision flips, identity flips, and keypoint drift
           for slots gated in both dtypes.

Writes a JSON report to runs/r3_numerics/<name>.json and prints it.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

OUT_DIR = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r3_numerics"


def _report(name: str, payload: dict) -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    (OUT_DIR / f"{name}.json").write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload, indent=2))


def check_twins() -> None:
    # twins run on CPU: scrub the axon relay (it treats ANY set value as
    # enabled and poisons compile caches with machine-mismatched AOT blobs)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    import jax
    import jax.numpy as jnp
    import torch

    from prpe_tpu.models import porting
    from prpe_tpu.nn.irnet import build_irnet
    from prpe_tpu.nn.vit import ViTPose
    from prpe_tpu.nn.yolo import YOLO, decode_predictions
    from test_porting_yolo_irnet import TIRNet, TYolo, _randomize_bn

    rng = np.random.default_rng(0)
    out = {}

    # --- YOLOv11-n nc=1 @ 640^2 (serving geometry) ---------------------
    torch.manual_seed(0)
    tm = TYolo(nc=1)
    tm.eval()
    _randomize_bn(tm, None)
    x = rng.normal(0, 1, size=(2, 3, 640, 640)).astype(np.float32)
    with torch.no_grad():
        maps = [m.numpy() for m in tm(torch.from_numpy(x))]
    variables = porting.port_yolo(tm.state_dict(), "n")
    model = YOLO(nc=1, variant="n")
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    drift = max(
        float(np.abs(np.asarray(g).transpose(0, 3, 1, 2) - m).max())
        for g, m in zip(got, maps)
    )
    dec = np.asarray(decode_predictions(
        [jnp.asarray(m.transpose(0, 2, 3, 1)) for m in maps], 1, 16))
    dec_jax = np.asarray(decode_predictions(got, 1, 16))
    out["yolo11n_640_rawmap_maxabs"] = drift
    out["yolo11n_640_decode_maxabs"] = float(np.abs(dec - dec_jax).max())

    # --- IR-50 @ 112^2 ---------------------------------------------------
    tm = TIRNet(num_layers=50, se=False)
    tm.eval()
    _randomize_bn(tm, None)
    x = rng.normal(0, 1, size=(4, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        w_emb, w_norm = tm(torch.from_numpy(x))
    variables = porting.port_irnet(tm.state_dict(), num_layers=50, mode="ir")
    model = build_irnet("ir_50")
    g_emb, g_norm = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out["ir50_112_embed_maxabs"] = float(
        np.abs(np.asarray(g_emb) - w_emb.numpy()).max())
    out["ir50_112_cos_min"] = float(
        (np.asarray(g_emb) * w_emb.numpy()).sum(-1).min())

    # --- ViTPose-B (full 12 x 768) @ 256x192 ------------------------------
    from transformers import VitPoseConfig, VitPoseForPoseEstimation
    from transformers.models.vitpose_backbone import VitPoseBackboneConfig

    bc = VitPoseBackboneConfig(
        num_hidden_layers=12, hidden_size=768, num_attention_heads=12,
        intermediate_size=3072, image_size=[256, 192], num_channels=3,
    )
    tm = VitPoseForPoseEstimation(VitPoseConfig(backbone_config=bc))
    tm.eval()
    with torch.no_grad():
        tm.backbone.embeddings.position_embeddings.normal_(0, 0.02)
    x = rng.normal(0, 1, size=(2, 3, 256, 192)).astype(np.float32)
    with torch.no_grad():
        want = tm(pixel_values=torch.from_numpy(x)).heatmaps.numpy()
    variables = porting.port_vitpose(tm.state_dict())
    model = ViTPose(image_size=(256, 192), num_keypoints=tm.config.num_labels,
                    hidden=768, layers=12, heads=12)
    got = np.asarray(
        model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    out["vitpose_b_256x192_heatmap_maxabs"] = float(np.abs(got - want).max())
    out["vitpose_b_256x192_heatmap_scale"] = float(np.abs(want).max())

    _report("twins_fullscale", out)


def check_bf16(n_scenes: int = 100, batch: int = 4) -> None:
    import jax
    import jax.numpy as jnp

    from prpe_tpu.core.config import CascadeConfig, DetectionConfig, PoseConfig
    from prpe_tpu.infer.cascade import CascadeModel, build_cascade_runner

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from bench_io import _make_scene  # synthetic scenes with detections

    rng = np.random.default_rng(7)
    ccfg = CascadeConfig(max_persons=8, max_faces=8, match_threshold=0.3)

    results = {}
    runners = {}
    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = CascadeModel(detection=DetectionConfig(), pose_cfg=PoseConfig(),
                             dtype=dtype)
        variables = jax.jit(
            lambda k, a, b, c, m=model: m.init(k, a, b, c, method="init_all")
        )(jax.random.key(0), jnp.zeros((1, 640, 640, 3), jnp.float32),
          jnp.zeros((1, 112, 112, 3), jnp.float32),
          jnp.zeros((1, 256, 192, 3), jnp.float32))
        runners[name] = (build_cascade_runner(model, ccfg, pose_capacity=batch),
                         variables)

    gallery = jax.random.normal(jax.random.key(2), (16, 512))
    gallery = gallery / jnp.linalg.norm(gallery, axis=-1, keepdims=True)

    gate_flips = id_flips = gated_both = valid_a = faces_both = 0
    kp_drift = []
    box_drift = []
    for start in range(0, n_scenes, batch):
        imgs = np.stack([
            _make_scene(rng, 640).astype(np.float32) / 255.0
            for _ in range(batch)
        ])
        res = {}
        for name, (run, variables) in runners.items():
            x = jnp.asarray(imgs, jnp.bfloat16 if name == "bf16" else jnp.float32)
            res[name] = jax.device_get(run(variables, x, gallery))
        a, b = res["fp32"], res["bf16"]
        valid_a += int(a.persons.valid.sum())
        box_drift.append(np.abs(
            np.where(a.persons.valid[..., None] & b.persons.valid[..., None],
                     a.persons.boxes - b.persons.boxes, 0)).max())
        gate_flips += int((a.person_gated != b.person_gated).sum())
        both_valid = a.faces.valid & b.faces.valid
        faces_both += int(both_valid.sum())
        id_flips += int((both_valid
                         & (a.face_identity != b.face_identity)).sum())
        both = a.pose_valid & b.pose_valid
        gated_both += int(both.sum())
        if both.any():
            kp_drift.append(np.abs(
                (a.pose_keypoints - b.pose_keypoints)[both]).max())

    out = {
        "scenes": n_scenes,
        "person_slots_valid_fp32": valid_a,
        "gate_decision_flips": gate_flips,
        "identity_flips": id_flips,
        "face_slots_compared": faces_both,
        "pose_slots_compared": gated_both,
        # pose_keypoints are image-pixel coordinates in the 640^2 frame
        # (infer/cascade.py:244-252)
        "keypoint_drift_maxabs_px640": float(max(kp_drift)) if kp_drift else None,
        "person_box_drift_maxabs_px": float(max(box_drift)),
    }
    # pass/fail tied to the BASELINE.md ±0.5% accuracy-parity north star:
    # bf16 serving may flip at most 0.5% of gate/identity decisions vs fp32,
    # and keypoint drift must stay under 0.5% of the image side (3.2px@640)
    # — drift below that bound cannot move COCO OKS AP by 0.5%.
    out["criteria"] = {
        "gate_flip_rate_max": 0.005,
        "identity_flip_rate_max": 0.005,
        "keypoint_drift_px640_max": 3.2,
    }
    kp = out["keypoint_drift_maxabs_px640"]
    out["pass"] = bool(
        gate_flips <= 0.005 * max(valid_a, 1)
        and id_flips <= 0.005 * max(faces_both, 1)
        and (kp is None or kp <= 3.2)
    )
    _report("cascade_fp32_vs_bf16", out)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "twins"
    if cmd == "twins":
        check_twins()
    elif cmd == "bf16":
        check_bf16()
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
