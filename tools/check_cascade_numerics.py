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
from functools import partial

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


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of two (N,4)/(M,4) xyxy box sets (host-side numpy)."""
    ax1, ay1, ax2, ay2 = a[:, None, 0], a[:, None, 1], a[:, None, 2], a[:, None, 3]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    iw = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0, None)
    ih = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0, None)
    inter = iw * ih
    area_a = np.clip(ax2 - ax1, 0, None) * np.clip(ay2 - ay1, 0, None)
    area_b = np.clip(bx2 - bx1, 0, None) * np.clip(by2 - by1, 0, None)
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


def _greedy_match(boxes_a, boxes_b, thr: float = 0.6):
    """Greedy best-IoU matching; returns list of (i, j, iou) pairs.

    Slot-index comparison is ill-posed across dtypes: near-tied NMS scores
    reorder top-k selection, so slot i holds DIFFERENT boxes in fp32 vs bf16
    (the round-4 first attempt measured 608px 'drift' that was purely slot
    misalignment). Matching by box identity isolates actual numerics."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return []
    iou = _iou_matrix(boxes_a, boxes_b)
    pairs = []
    used_b = set()
    for i in np.argsort(-iou.max(axis=1)):
        j_order = np.argsort(-iou[i])
        for j in j_order:
            if iou[i, j] < thr:
                break
            if j not in used_b:
                pairs.append((int(i), int(j), float(iou[i, j])))
                used_b.add(int(j))
                break
    return pairs


def check_bf16(n_scenes: int = 100, batch: int = 4,
               person_ckpt: str = None, face_ckpt: str = None,
               pose_ckpt: str = None, pose_crops: int = 128) -> None:
    import jax
    import jax.numpy as jnp

    from prpe_tpu.core.config import CascadeConfig, DetectionConfig, PoseConfig
    from prpe_tpu.infer.cascade import CascadeModel, build_cascade_runner

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from bench_io import _make_scene as _make_scene_plain  # noqa: F401
    from make_synthetic_multitask_data import _KP_COLORS, _SKELETON

    def _make_scene(rng, size):
        """bench_io's person/face rectangles PLUS a colored-dot skeleton in
        each person box — the pose checkpoint's training distribution
        (tools/make_numerics_pose_ckpt.py). Without the dots, crops contain
        no keypoint signal, heatmaps have no peaks, and the cross-dtype
        argmax comparison is noise-vs-noise (measured 116 px of vacuity
        even with trained weights)."""
        img = (rng.random((size, size, 3)) * 60).astype(np.uint8)
        for _ in range(rng.integers(1, 4)):
            x, y = rng.integers(0, size - 200, 2)
            w, h = int(rng.integers(120, 200)), int(rng.integers(240, 320))
            h = min(h, size - y - 1)
            w = min(w, size - x - 1)
            img[y:y + h, x:x + w] = rng.integers(120, 255, 3, np.uint8)
            fh = max(h // 4, 16)
            img[y:y + fh, x:x + w] = rng.integers(180, 255, 3, np.uint8)
            pts = _SKELETON + rng.normal(0, 0.02, _SKELETON.shape)
            for k in range(17):
                kx = int(np.clip(x + pts[k, 0] * w, 1, size - 2))
                ky = int(np.clip(y + pts[k, 1] * h, 1, size - 2))
                r = max(int(0.011 * size), 3)
                ys, xs = np.ogrid[-r:r + 1, -r:r + 1]
                disc = ys * ys + xs * xs <= r * r
                y1, y2 = max(ky - r, 0), min(ky + r + 1, size)
                x1, x2 = max(kx - r, 0), min(kx + r + 1, size)
                img[y1:y2, x1:x2][disc[r - (ky - y1): r + (y2 - ky),
                                       r - (kx - x1): r + (x2 - kx)]] = (
                    _KP_COLORS[k] * 255).astype(np.uint8)
        return img

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
    cascade_models = {}
    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = CascadeModel(detection=DetectionConfig(), pose_cfg=PoseConfig(),
                             dtype=dtype)
        variables = jax.jit(
            lambda k, a, b, c, m=model: m.init(k, a, b, c, method="init_all")
        )(jax.random.key(0), jnp.zeros((1, 640, 640, 3), jnp.float32),
          jnp.zeros((1, 112, 112, 3), jnp.float32),
          jnp.zeros((1, 256, 192, 3), jnp.float32))
        # optional TRAINED detector weights (cli.train_yolo checkpoints):
        # trained detectors emit separated scores, so cross-dtype NMS
        # selection is stable and the comparison measures numerics, not
        # random-weight near-ties. Both dtype variants get the SAME weights.
        # trained ViTPose weights make the keypoint comparison meaningful:
        # random-init heatmaps are noise, and ARGMAX of noise is maximally
        # dtype-sensitive (measured 126px same-crop "drift" that was pure
        # vacuity — the pose edition of the random-detector/NMS-churn lesson)
        for slot, ckpt_path in (("person_yolo", person_ckpt),
                                ("face_yolo", face_ckpt),
                                ("vitpose", pose_ckpt)):
            if ckpt_path:
                import orbax.checkpoint as ocp

                template = {
                    "params": jax.device_get(variables["params"][slot]),
                }
                bs = jax.device_get(variables["batch_stats"].get(slot, {}))
                if bs:  # BN-free modules (vitpose) save params-only ckpts
                    template["batch_stats"] = bs
                restored = ocp.StandardCheckpointer().restore(
                    pathlib.Path(ckpt_path).absolute(), template)
                variables["params"][slot] = jax.tree_util.tree_map(
                    jnp.asarray, restored["params"])
                if restored.get("batch_stats"):
                    variables["batch_stats"][slot] = jax.tree_util.tree_map(
                        jnp.asarray, restored["batch_stats"])
        runners[name] = (build_cascade_runner(model, ccfg, pose_capacity=batch),
                         variables)
        cascade_models[name] = model

    gallery = jax.random.normal(jax.random.key(2), (16, 512))
    gallery = gallery / jnp.linalg.norm(gallery, axis=-1, keepdims=True)

    # a decision is MARGINAL when the fp32 gate score sits within +-eps of
    # the threshold: there any numeric format flips coin-toss inputs, so
    # flips are counted separately from real (clear-margin) disagreements
    eps = 0.02
    thr = ccfg.match_threshold
    # raw match rates include detections barely over the 0.005 eval conf
    # floor, whose score-rank order flips freely between dtypes (NMS churn
    # among near-ties) — none of which a serving deployment (conf 0.25)
    # would ever emit. The CONFIDENT subset (fp32 score >= conf_cut) is the
    # product-visible population the parity criterion judges.
    conf_cut = 0.10
    person_total = person_matched = person_conf_total = person_conf_matched = 0
    face_total = face_matched = face_clear = 0
    face_conf_total = face_conf_matched = 0
    gate_pairs = gate_flips = gate_pairs_clear = gate_flips_clear = 0
    id_flips = 0
    pose_pairs = pose_pairs_tight = 0
    box_drift = [0.0]
    sim_drift = [0.0]
    kp_drift = [0.0]
    kp_drift_tight = [0.0]
    # non-tight matched-person diagnostics: when bf16's NMS keeps a
    # DIFFERENT near-tied candidate box of the same object, the "drift" is
    # selection churn, not coordinate error — the score gap tells them apart
    non_tight = []  # (box_drift_px, |score_fp32 - score_bf16|, iou)
    # same-crop pose leg: (image, fp32 person box) pairs re-cropped once and
    # run through BOTH dtype ViTPose stages — pure pose numerics at scale
    crop_bank = []  # (img_array, box)
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

        for img in range(batch):
            # ---- persons: IoU-match fp32 boxes to bf16 boxes -------------
            ia = np.where(a.persons.valid[img])[0]
            ib = np.where(b.persons.valid[img])[0]
            person_total += len(ia)
            # bank up to 2 fp32 person crops per image for the same-crop leg
            if len(crop_bank) < pose_crops:
                for s in ia[:2]:
                    crop_bank.append((imgs[img], a.persons.boxes[img, int(s)]))
            pairs = _greedy_match(a.persons.boxes[img][ia],
                                  b.persons.boxes[img][ib])
            person_matched += len(pairs)
            conf_mask = a.persons.scores[img][ia] >= conf_cut
            person_conf_total += int(conf_mask.sum())
            person_conf_matched += sum(
                1 for pi, pj, _ in pairs if conf_mask[pi])
            img_marginal = bool((a.faces.valid[img]
                                 & (np.abs(a.face_similarity[img] - thr)
                                    <= eps)).any())
            for pi, pj, pair_iou in pairs:
                sa, sb = int(ia[pi]), int(ib[pj])
                bd = float(np.abs(
                    a.persons.boxes[img, sa] - b.persons.boxes[img, sb]).max())
                box_drift.append(bd)
                if bd >= 1.0:
                    non_tight.append((
                        bd,
                        float(abs(a.persons.scores[img, sa]
                                  - b.persons.scores[img, sb])),
                        float(pair_iou),
                    ))
                gate_pairs += 1
                flip = bool(a.person_gated[img, sa] != b.person_gated[img, sb])
                gate_flips += int(flip)
                if not img_marginal:
                    gate_pairs_clear += 1
                    gate_flips_clear += int(flip)

            # ---- faces ---------------------------------------------------
            fa = np.where(a.faces.valid[img])[0]
            fb = np.where(b.faces.valid[img])[0]
            face_total += len(fa)
            fpairs = _greedy_match(a.faces.boxes[img][fa],
                                   b.faces.boxes[img][fb])
            face_matched += len(fpairs)
            fconf = a.faces.scores[img][fa] >= conf_cut
            face_conf_total += int(fconf.sum())
            face_conf_matched += sum(1 for pi, pj, _ in fpairs if fconf[pi])
            for pi, pj, _ in fpairs:
                sa, sb = int(fa[pi]), int(fb[pj])
                sim_drift.append(float(np.abs(
                    a.face_similarity[img, sa] - b.face_similarity[img, sb])))
                if abs(float(a.face_similarity[img, sa]) - thr) > eps:
                    face_clear += 1
                    id_flips += int(a.face_identity[img, sa]
                                    != b.face_identity[img, sb])

        # ---- pose slots: match by (image, person-box IoU) ----------------
        pa = np.where(a.pose_valid)[0]
        for sa in pa:
            img = int(a.pose_image_idx[sa])
            cand = [sb for sb in np.where(b.pose_valid)[0]
                    if int(b.pose_image_idx[sb]) == img]
            if not cand:
                continue
            ious = _iou_matrix(a.pose_boxes[sa][None],
                               np.stack([b.pose_boxes[c] for c in cand]))[0]
            j = int(np.argmax(ious))
            if ious[j] < 0.6:
                continue
            sb = cand[j]
            pose_pairs += 1
            d = float(np.abs(a.pose_keypoints[sa] - b.pose_keypoints[sb]).max())
            kp_drift.append(d)
            bd = float(np.abs(a.pose_boxes[sa] - b.pose_boxes[sb]).max())
            if bd < 1.0:  # same crop to within a pixel: pure numeric drift
                pose_pairs_tight += 1
                kp_drift_tight.append(d)

    # ---- same-crop pose leg: identical fp32 crops through both dtypes ----
    # In-cascade "tight" pairs (<1px person-box agreement across dtypes) are
    # rare by construction: bf16 DFL box decode quantizes coordinates at
    # ~1-2px@640, so matched boxes typically differ by a few px and the crop
    # contents shift. Re-cropping each fp32 person box ONCE and running the
    # SAME crop through the fp32 and bf16 ViTPose stages isolates the pose
    # numerics with a sample size set by --pose-crops, not by NMS luck.
    same_crop_drift = [0.0]
    n_bank = len(crop_bank)
    if crop_bank:
        import jax
        import jax.numpy as jnp

        from prpe_tpu.infer.cascade import IMAGENET_MEAN, IMAGENET_STD
        from prpe_tpu.ops.heatmap import decode_heatmaps
        from prpe_tpu.ops.roi import crop_and_resize_batch

        from prpe_tpu.core.config import PoseConfig

        ph, pw = PoseConfig().input_size
        cb = 16  # crop batch
        # pad the bank to a multiple of the batch (repeat last entry)
        while len(crop_bank) % cb:
            crop_bank.append(crop_bank[-1])

        @jax.jit
        def _crop(images, boxes):
            crops = crop_and_resize_batch(
                images, boxes, jnp.arange(boxes.shape[0]), (ph, pw))
            return (crops - IMAGENET_MEAN) / IMAGENET_STD

        def make_pose_fn(model, dt):
            # variables must be a traced ARGUMENT — closing over them bakes
            # the weights into the jaxpr as literals and the remote-compile
            # payload blows past the relay's request limit (HTTP 413)
            @jax.jit
            def f(variables, crops):
                hm = model.apply(variables, crops.astype(dt), method="pose")
                c, _ = decode_heatmaps(jnp.asarray(hm, jnp.float32))
                return c

            return f

        pose_fns = {
            name: (make_pose_fn(cascade_models[name],
                                jnp.bfloat16 if name == "bf16" else jnp.float32),
                   runners[name][1])
            for name in ("fp32", "bf16")
        }

        def _pose(name, crops):
            f, variables = pose_fns[name]
            return np.asarray(f(variables, crops))

        for s in range(0, len(crop_bank), cb):
            chunk = crop_bank[s:s + cb]
            images = jnp.asarray(np.stack([c[0] for c in chunk]))
            boxes = jnp.asarray(np.stack([c[1] for c in chunk]))
            crops = _crop(images, boxes)
            ca = _pose("fp32", crops)
            cbf = _pose("bf16", crops)
            bwh = np.stack([boxes[:, 2] - boxes[:, 0],
                            boxes[:, 3] - boxes[:, 1]], -1)
            # normalized-crop drift -> image pixels through the source box
            d = np.abs(ca - cbf) * np.asarray(bwh)[:, None, :]
            same_crop_drift += [float(x) for x in d.reshape(len(chunk), -1).max(-1)]
        same_crop_drift = same_crop_drift[:1 + n_bank]  # drop pad duplicates

    out = {
        "scenes": n_scenes,
        "person_detections_fp32": person_total,
        "person_detection_match_rate": round(person_matched / max(person_total, 1), 4),
        "confident_score_cut": conf_cut,
        "person_confident_fp32": person_conf_total,
        "person_confident_match_rate": round(
            person_conf_matched / max(person_conf_total, 1), 4),
        "face_confident_fp32": face_conf_total,
        "face_confident_match_rate": round(
            face_conf_matched / max(face_conf_total, 1), 4),
        "matched_person_box_drift_maxabs_px": float(max(box_drift)),
        "gate_pairs": gate_pairs,
        "gate_flips": gate_flips,
        "gate_pairs_clear_margin": gate_pairs_clear,
        "gate_flips_clear_margin": gate_flips_clear,
        "face_detections_fp32": face_total,
        "face_detection_match_rate": round(face_matched / max(face_total, 1), 4),
        "face_similarity_drift_maxabs": float(max(sim_drift)),
        "face_pairs_clear_margin": face_clear,
        "identity_flips_clear_margin": id_flips,
        "margin_eps": eps,
        # pose_keypoints are image-pixel coordinates in the 640^2 frame
        # (infer/cascade.py:244-252)
        "pose_pairs": pose_pairs,
        "keypoint_drift_maxabs_px640": float(max(kp_drift)),
        # pairs whose person box agrees to <1px — same crop, pure numerics.
        # Rare by construction (bf16 DFL decode quantizes boxes at ~1-2px);
        # the same-crop leg below is the statistically meaningful bound.
        "pose_pairs_tight": pose_pairs_tight,
        "keypoint_drift_tight_maxabs_px640": float(max(kp_drift_tight)),
        # same-crop leg: every banked fp32 person box re-cropped once, the
        # IDENTICAL crop through fp32 and bf16 ViTPose — pure pose numerics
        "pose_same_crop_pairs": len(same_crop_drift) - 1,
        "keypoint_drift_same_crop_maxabs_px640": float(max(same_crop_drift)),
        "keypoint_drift_same_crop_p99_px640": float(
            np.percentile(same_crop_drift, 99)) if len(same_crop_drift) > 1 else 0.0,
        # non-tight matched persons: box drift vs NMS score gap. Score gaps
        # within bf16 rounding (~0.004 relative) with multi-px box deltas
        # mean bf16 NMS kept a DIFFERENT near-tied candidate of the same
        # object — selection churn among near-ties, not coordinate error
        "non_tight_pairs": len(non_tight),
        "non_tight_box_drift_max_px": float(max((t[0] for t in non_tight),
                                                default=0.0)),
        "non_tight_score_gap_max": float(max((t[1] for t in non_tight),
                                             default=0.0)),
        "non_tight_iou_min": float(min((t[2] for t in non_tight),
                                       default=1.0)),
    }
    # pass/fail tied to the BASELINE.md ±0.5% accuracy-parity north star:
    # bf16 serving may flip at most 0.5% of CLEAR-MARGIN gate decisions vs
    # fp32 (marginal slots — fp32 score within +-eps of the threshold — are
    # coin tosses in any format and are reported, not judged); same-crop
    # keypoint drift must stay under 0.5% of the image side (3.2px@640) —
    # drift below that bound cannot move COCO OKS AP by 0.5%; and ≥95% of
    # fp32 detections must have a bf16 counterpart (score rank flips among
    # near-tied NMS candidates account for the rest and are reported).
    out["criteria"] = {
        "clear_gate_flip_rate_max": 0.005,
        "identity_flip_rate_max": 0.005,
        "same_crop_keypoint_drift_px640_max": 3.2,
        "same_crop_pairs_min": 50,
        "detection_match_rate_min": 0.95,
        "judged_on": "confident subset (fp32 score >= confident_score_cut)",
        "non_vacuous": "person/face/pose comparisons must be non-empty",
    }
    # a comparison that compared nothing must not pass (the vacuous-pass
    # failure mode of the first round-4 run). The keypoint bound is judged
    # on the same-crop leg (>=50 pairs required); the in-cascade tight pairs
    # stay reported but no longer gate the verdict (n was 1 in round 4).
    out["pass"] = bool(
        person_total > 0 and face_clear > 0 and pose_pairs > 0
        and person_conf_total > 0 and face_conf_total > 0
        and out["pose_same_crop_pairs"] >= 50
        and out["person_confident_match_rate"] >= 0.95
        and out["face_confident_match_rate"] >= 0.95
        and gate_flips_clear <= 0.005 * max(gate_pairs_clear, 1)
        and id_flips <= 0.005 * max(face_clear, 1)
        and out["keypoint_drift_same_crop_maxabs_px640"] <= 3.2
    )
    _report("cascade_fp32_vs_bf16", out)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cmd", nargs="?", default="twins",
                    choices=("twins", "bf16"))
    ap.add_argument("--scenes", type=int, default=100)
    ap.add_argument("--person-ckpt", default=None,
                    help="cli.train_yolo checkpoint dir for the person "
                         "detector (trained weights make cross-dtype NMS "
                         "selection stable)")
    ap.add_argument("--face-ckpt", default=None)
    ap.add_argument("--pose-ckpt", default=None,
                    help="tools/make_numerics_pose_ckpt.py checkpoint — "
                         "trained ViTPose weights make the keypoint "
                         "comparison non-vacuous")
    ap.add_argument("--pose-crops", type=int, default=128,
                    help="same-crop pose-leg sample size (fp32 person boxes "
                         "re-cropped once, run through both dtype ViTPose)")
    a = ap.parse_args()
    if a.cmd == "twins":
        check_twins()
    else:
        check_bf16(n_scenes=a.scenes, person_ckpt=a.person_ckpt,
                   face_ckpt=a.face_ckpt, pose_ckpt=a.pose_ckpt,
                   pose_crops=a.pose_crops)
