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
    # Thresholds tuned for FRESH-INIT weights (no ported checkpoints exist in
    # this zero-egress environment): the serving defaults (conf 0.25, match
    # 0.4) gate out every random-weight detection and the comparison is
    # vacuous — round 4's first run compared exactly 0 slots. conf 0.005
    # lets the random detector fill its NMS slots; match 0.1 sits in the
    # middle of the random-embedding max-cosine distribution so the identity
    # gate actually fires (and can flip) on both sides.
    ccfg = CascadeConfig(max_persons=8, max_faces=8,
                         conf_threshold=0.005, match_threshold=0.1)

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

    # a decision is MARGINAL when the fp32 gate score sits within +-eps of
    # the threshold: there any numeric format flips coin-toss inputs, so
    # flips are counted separately from real (clear-margin) disagreements
    eps = 0.02
    thr = ccfg.match_threshold
    gate_flips = gate_flips_clear = id_flips = 0
    gated_both = valid_a = faces_both = faces_clear = 0
    sim_drift = []
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

        both_valid = a.faces.valid & b.faces.valid
        faces_both += int(both_valid.sum())
        id_flips += int((both_valid
                         & (a.face_identity != b.face_identity)).sum())
        sim_drift.append(np.abs(np.where(
            both_valid, a.face_similarity - b.face_similarity, 0)).max())
        clear_face = both_valid & (np.abs(a.face_similarity - thr) > eps)
        faces_clear += int(clear_face.sum())

        flips = a.person_gated != b.person_gated
        gate_flips += int(flips.sum())
        # person slots in images with NO marginal fp32 face decision: a gate
        # flip there is a real disagreement, not threshold noise
        img_marginal = (both_valid
                        & (np.abs(a.face_similarity - thr) <= eps)).any(-1)
        gate_flips_clear += int((flips & ~img_marginal[:, None]).sum())

        both = a.pose_valid & b.pose_valid
        gated_both += int(both.sum())
        if both.any():
            kp_drift.append(np.abs(
                (a.pose_keypoints - b.pose_keypoints)[both]).max())

    out = {
        "scenes": n_scenes,
        "person_slots_valid_fp32": valid_a,
        "gate_decision_flips": gate_flips,
        "gate_decision_flips_clear_margin": gate_flips_clear,
        "identity_flips": id_flips,
        "face_slots_compared": faces_both,
        "face_slots_clear_margin": faces_clear,
        "margin_eps": eps,
        "face_similarity_drift_maxabs": float(max(sim_drift)),
        "pose_slots_compared": gated_both,
        # pose_keypoints are image-pixel coordinates in the 640^2 frame
        # (infer/cascade.py:244-252)
        "keypoint_drift_maxabs_px640": float(max(kp_drift)) if kp_drift else None,
        "person_box_drift_maxabs_px": float(max(box_drift)),
    }
    # pass/fail tied to the BASELINE.md ±0.5% accuracy-parity north star:
    # bf16 serving may flip at most 0.5% of CLEAR-MARGIN gate decisions vs
    # fp32 (marginal slots — fp32 score within +-eps of the threshold — are
    # coin tosses in any format and are reported, not judged), and keypoint
    # drift must stay under 0.5% of the image side (3.2px@640) — drift below
    # that bound cannot move COCO OKS AP by 0.5%.
    out["criteria"] = {
        "clear_gate_flip_rate_max": 0.005,
        "keypoint_drift_px640_max": 3.2,
        "non_vacuous": "person/face/pose comparisons must be non-empty",
    }
    kp = out["keypoint_drift_maxabs_px640"]
    # a comparison that compared nothing must not pass (the vacuous-pass
    # failure mode of the first round-4 run)
    out["pass"] = bool(
        valid_a > 0 and faces_both > 0 and gated_both > 0
        and gate_flips_clear <= 0.005 * valid_a
        and kp is not None and kp <= 3.2
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
