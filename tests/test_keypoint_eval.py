"""Golden validation of the hand-rolled COCO keypoint evaluator.

pycocotools is not installed in this image, so the golden here is a careful
LINE-LEVEL loop transcription of the public ``pycocotools/cocoeval.py``
(computeOks -> evaluateImg -> accumulate -> summarize, keypoints branch,
maxDets=20, areaRng all/medium/large) — deliberately structured clause by
clause like the original so it can be diffed against the public source. The
production evaluator (prpe_tpu/eval/keypoint_eval.py) is an independent
restructuring; agreement across randomized scenarios (crowds, zero-keypoint
gts, area-range edges, score ties, unmatched dets) is the round-1 verdict's
missing item 6. Reference consumer being replaced:
training/lightning/pose_estimation/module.py:578-628.
"""

import numpy as np

from prpe_tpu.eval.keypoint_eval import (
    KPT_SIGMAS, MAX_DETS, OKS_THRESHOLDS, evaluate_keypoints,
)

AREA_RNGS = [(0.0**2, 1e5**2), (32.0**2, 96.0**2), (96.0**2, 1e5**2)]
REC_THRS = np.linspace(0.0, 1.0, 101)


# ---------------------------------------------------------------------------
# pycocotools transcription (keypoints branch)
# ---------------------------------------------------------------------------

def _compute_oks_img(dts, gts):
    """cocoeval.py computeOks — dts already score-sorted + truncated."""
    if len(gts) == 0 or len(dts) == 0:
        return np.zeros((len(dts), len(gts)))
    sigmas = np.asarray(KPT_SIGMAS, np.float64)
    var = (sigmas * 2) ** 2
    k = len(sigmas)
    ious = np.zeros((len(dts), len(gts)))
    for j, gt in enumerate(gts):
        g = np.array(gt["keypoints"], np.float64)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = np.count_nonzero(vg > 0)
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = np.array(dt["keypoints"], np.float64)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
            else:
                z = np.zeros(k)
                dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
                dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
            e = (dx**2 + dy**2) / var / (gt["area"] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def _evaluate_img(gts, dts, ious, a_rng, max_det):
    """cocoeval.py evaluateImg."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    for g in gts:
        g["_ignore"] = 1 if (
            g["ignore"] or g["area"] < a_rng[0] or g["area"] > a_rng[1]
        ) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[0:max_det]]
    iscrowd = [int(o["iscrowd"]) for o in gts]
    ious = ious[:, gtind] if len(ious) > 0 else ious

    T, G, D = len(OKS_THRESHOLDS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if len(ious) != 0:
        for tind, t in enumerate(OKS_THRESHOLDS):
            for dind, d in enumerate(dts):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gts):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = m + 1  # gt "id" stand-in (nonzero)
                gtm[tind, m] = dind + 1
    a = np.array(
        [d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dts]
    ).reshape((1, len(dts)))
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def cocoeval_reference(predictions, annotations):
    """cocoeval.py evaluate + accumulate + summarize (keypoints)."""
    gts_by_img, dts_by_img = {}, {}
    for a in annotations:
        kp = np.asarray(a["keypoints"])
        g = dict(a)
        g.setdefault("iscrowd", 0)
        nk = a.get("num_keypoints", int((kp[2::3] > 0).sum()))
        g["ignore"] = 1 if (g["iscrowd"] or nk == 0) else 0
        gts_by_img.setdefault(a["image_id"], []).append(g)
    for p in predictions:
        d = dict(p)
        # COCO.loadRes keypoint-result geometry: area is ALWAYS recomputed
        # from the keypoint extent, clobbering any caller-supplied value
        # (pycocotools coco.py loadRes keypoints branch)
        kp = np.asarray(p["keypoints"], np.float64)
        x, y = kp[0::3], kp[1::3]
        d["area"] = (x.max() - x.min()) * (y.max() - y.min())
        dts_by_img.setdefault(p["image_id"], []).append(d)

    img_ids = sorted(set(gts_by_img) | set(dts_by_img))
    ious = {}
    for img in img_ids:
        dts = sorted(dts_by_img.get(img, []), key=lambda d: -d["score"])
        ious[img] = _compute_oks_img(dts[:MAX_DETS], gts_by_img.get(img, []))

    T, R, A = len(OKS_THRESHOLDS), len(REC_THRS), len(AREA_RNGS)
    precision = -np.ones((T, R, A))
    recall = -np.ones((T, A))
    for aind, a_rng in enumerate(AREA_RNGS):
        evals = [
            _evaluate_img(
                [dict(g) for g in gts_by_img.get(img, [])],
                [dict(d) for d in dts_by_img.get(img, [])],
                ious[img], a_rng, MAX_DETS,
            )
            for img in img_ids
        ]
        evals = [e for e in evals if e is not None]
        if not evals:
            continue
        dt_scores = np.concatenate([e["dtScores"][0:MAX_DETS] for e in evals])
        inds = np.argsort(-dt_scores, kind="mergesort")
        dtm = np.concatenate(
            [e["dtMatches"][:, 0:MAX_DETS] for e in evals], axis=1)[:, inds]
        dt_ig = np.concatenate(
            [e["dtIgnore"][:, 0:MAX_DETS] for e in evals], axis=1)[:, inds]
        gt_ig = np.concatenate([e["gtIgnore"] for e in evals])
        npig = np.count_nonzero(gt_ig == 0)
        if npig == 0:
            continue
        tps = np.logical_and(dtm, np.logical_not(dt_ig))
        fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
        for t, (tp, fp) in enumerate(
            zip(np.cumsum(tps, 1).astype(float), np.cumsum(fps, 1).astype(float))
        ):
            nd = len(tp)
            rc = tp / npig
            pr = (tp / (fp + tp + np.spacing(1))).tolist()
            recall[t, aind] = rc[-1] if nd else 0
            q = np.zeros(R)
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            for ri, pi in enumerate(np.searchsorted(rc, REC_THRS, side="left")):
                try:
                    q[ri] = pr[pi]
                except IndexError:
                    pass
            precision[t, :, aind] = q

    def _summ(ap, iou_thr, aind):
        s = precision[:, :, aind] if ap else recall[:, aind]
        if iou_thr is not None:
            t = int(np.where(np.isclose(OKS_THRESHOLDS, iou_thr))[0][0])
            s = s[t:t + 1]
        s = s[s > -1]
        return -1.0 if s.size == 0 else float(np.mean(s))

    return {
        "AP": _summ(1, None, 0), "AP50": _summ(1, 0.5, 0),
        "AP75": _summ(1, 0.75, 0), "APm": _summ(1, None, 1),
        "APl": _summ(1, None, 2),
        "AR": _summ(0, None, 0), "AR50": _summ(0, 0.5, 0),
        "AR75": _summ(0, 0.75, 0), "ARm": _summ(0, None, 1),
        "ARl": _summ(0, None, 2),
    }


# ---------------------------------------------------------------------------
# randomized scenario generation + the agreement test
# ---------------------------------------------------------------------------

def _scenario(seed):
    """Images with noisy matches, misses, crowds, zero-kpt gts, score ties,
    areas straddling the 32^2/96^2 edges (incl. exactly 96^2)."""
    rng = np.random.default_rng(seed)
    anns, preds = [], []
    for img in range(rng.integers(2, 5)):
        for _ in range(rng.integers(0, 4)):
            side = float(rng.choice([20.0, 50.0, 96.0, 150.0, 400.0]))
            cx, cy = rng.uniform(50, 450, 2)
            xy = np.stack([cx, cy]) + rng.normal(0, side / 4, (17, 2))
            vis = rng.integers(0, 3, 17)
            crowd = bool(rng.random() < 0.2)
            unlabeled = bool(rng.random() < 0.2)
            if unlabeled:
                vis[:] = 0
            k = np.concatenate([xy, vis[:, None]], 1).astype(np.float64)
            k[vis == 0, :2] = 0.0
            anns.append({
                "image_id": img,
                "keypoints": k.reshape(-1).tolist(),
                "area": side**2,
                "bbox": [cx - side / 2, cy - side / 2, side, side],
                "iscrowd": int(crowd),
                "num_keypoints": int((vis > 0).sum()),
            })
            # 0-2 predictions near this gt
            for _ in range(rng.integers(0, 3)):
                noise = rng.choice([1.0, side / 8, side / 2])
                pk = np.concatenate(
                    [xy + rng.normal(0, noise, (17, 2)),
                     np.full((17, 1), 1.0)], 1)
                preds.append({
                    "image_id": img,
                    "keypoints": pk.reshape(-1).tolist(),
                    # quantized scores force ties across images
                    "score": round(float(rng.uniform(0.1, 1.0)), 1),
                })
        # plus some far-off false positives
        for _ in range(rng.integers(0, 3)):
            pk = np.concatenate(
                [rng.uniform(900, 1000, (17, 2)), np.full((17, 1), 1.0)], 1)
            preds.append({
                "image_id": img,
                "keypoints": pk.reshape(-1).tolist(),
                "score": round(float(rng.uniform(0.1, 1.0)), 1),
            })
    return preds, anns


def test_keypoint_eval_matches_cocoeval_transcription():
    checked = 0
    for seed in range(12):
        preds, anns = _scenario(seed)
        got = evaluate_keypoints(preds, anns)
        want = cocoeval_reference(preds, anns)
        for key, w in want.items():
            assert abs(got[key] - w) < 1e-6, (
                f"seed {seed}: {key} got {got[key]:.6f} want {w:.6f}")
        checked += sum(1 for v in want.values() if v > -1)
    assert checked > 40  # the scenarios must actually exercise the stats


def test_keypoint_eval_crowd_absorbs_without_fp():
    """A det matching only a crowd gt is ignored, not a false positive —
    AP for the real gt stays 1.0 (the divergence round 1 flagged)."""
    k_real = np.concatenate(
        [np.tile([[100.0, 100.0]], (17, 1))
         + np.arange(17)[:, None] * [3.0, 2.0],
         np.full((17, 1), 2.0)], 1)
    k_crowd = np.zeros((17, 3))
    anns = [
        {"image_id": 0, "keypoints": k_real.reshape(-1).tolist(),
         "area": 120.0**2, "bbox": [90, 90, 60, 40], "num_keypoints": 17},
        {"image_id": 0, "keypoints": k_crowd.reshape(-1).tolist(),
         "area": 200.0**2, "bbox": [300, 300, 200, 200], "iscrowd": 1,
         "num_keypoints": 0},
    ]
    in_crowd = np.concatenate(
        [np.tile([[350.0, 350.0]], (17, 1)), np.full((17, 1), 1.0)], 1)
    preds = [
        {"image_id": 0, "keypoints": k_real.reshape(-1).tolist(),
         "score": 0.9},
        {"image_id": 0, "keypoints": in_crowd.reshape(-1).tolist(),
         "score": 0.95},  # higher-scored, lands inside the crowd bbox
    ]
    m = evaluate_keypoints(preds, anns)
    assert m["AP"] > 0.99 and m["AR"] > 0.99
    assert m == evaluate_keypoints(preds, anns)  # deterministic


def test_keypoint_eval_out_of_range_match_is_ignored():
    """A det matched to an out-of-area-range gt is IGNORED in that range
    (COCOeval), not counted as FP — medium-range AP must be unaffected by a
    large-gt match."""
    def kp(cx, cy, spread):
        xy = np.tile([[cx, cy]], (17, 1)) + np.arange(17)[:, None] * [spread, 0]
        return np.concatenate([xy, np.full((17, 1), 2.0)], 1)

    k_med, k_large = kp(100, 100, 2.0), kp(400, 400, 10.0)
    anns = [
        {"image_id": 0, "keypoints": k_med.reshape(-1).tolist(),
         "area": 50.0**2, "bbox": [80, 90, 40, 20], "num_keypoints": 17},
        {"image_id": 0, "keypoints": k_large.reshape(-1).tolist(),
         "area": 200.0**2, "bbox": [380, 390, 170, 20], "num_keypoints": 17},
    ]
    preds = [
        {"image_id": 0, "keypoints": k_med.reshape(-1).tolist(), "score": 0.8},
        {"image_id": 0, "keypoints": k_large.reshape(-1).tolist(), "score": 0.9},
    ]
    m = evaluate_keypoints(preds, anns)
    assert m["APm"] > 0.99  # large-gt match didn't pollute the medium range
    assert m["APl"] > 0.99
    assert m["AP"] > 0.99
