"""COCO-style keypoint evaluation (OKS AP suite), dependency-free.

The reference shells out to pycocotools' COCOeval
(reference: training/lightning/pose_estimation/module.py:578-628); that
package is not in this image, so the keypoint branch of the published COCO
evaluation protocol is implemented here directly:

  * OKS between a predicted 17-keypoint skeleton and a gt annotation:
      OKS = mean_i exp(-d_i^2 / (2 s^2 k_i^2))  over labeled keypoints,
    with s^2 = gt area and k_i = 2*sigma_i (COCO constants)
  * per-image greedy matching of score-sorted predictions to gts at OKS
    thresholds .50:.05:.95
  * AP/AR with 101-point interpolation, plus medium (32^2..96^2) and large
    (>96^2) area ranges — the stats the reference logs at module.py:612-624

Prediction/annotation dicts use the COCO json schema so results remain
interchangeable with pycocotools when it is available.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np

KPT_SIGMAS = np.array(
    [.026, .025, .025, .035, .035, .079, .079, .072, .072, .062, .062,
     .107, .107, .087, .087, .089, .089], np.float32)

OKS_THRESHOLDS = np.linspace(0.5, 0.95, 10)
AREA_RANGES = {
    "all": (0.0, float("inf")),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, float("inf")),
}


def compute_oks(pred_kpts: np.ndarray, gt_kpts: np.ndarray, gt_area: float) -> float:
    """OKS of one (17, 3) prediction vs one (17, 3) gt annotation."""
    vis = gt_kpts[:, 2] > 0
    if not vis.any():
        return 0.0
    d2 = (pred_kpts[:, 0] - gt_kpts[:, 0]) ** 2 + (pred_kpts[:, 1] - gt_kpts[:, 1]) ** 2
    k = 2.0 * KPT_SIGMAS
    e = d2 / (2.0 * max(gt_area, 1e-9) * k**2 + np.finfo(np.float64).eps)
    return float(np.exp(-e[vis]).mean())


def _interp_ap(recalls: np.ndarray, precisions: np.ndarray) -> float:
    """101-point interpolated AP (the COCO accumulate step)."""
    order = recalls.argsort()
    recalls, precisions = recalls[order], precisions[order]
    # precision envelope
    precisions = np.maximum.accumulate(precisions[::-1])[::-1]
    x = np.linspace(0, 1, 101)
    interp = np.zeros_like(x)
    idx = np.searchsorted(recalls, x, side="left")
    ok = idx < len(precisions)
    interp[ok] = precisions[idx[ok]]
    return float(interp.mean())


def evaluate_keypoints(
    predictions: Sequence[dict],
    annotations: Sequence[dict],
    thresholds: np.ndarray = OKS_THRESHOLDS,
) -> Dict[str, float]:
    """COCO keypoint AP suite.

    Args:
      predictions: COCO result dicts
        {image_id, keypoints [51], score, (bbox), (area)}.
      annotations: COCO gt dicts
        {image_id, keypoints [51], area, (iscrowd), (num_keypoints)}.

    Returns {AP, AP50, AP75, APm, APl, AR, AR50, AR75, ARm, ARl}.
    """
    gts_by_img = defaultdict(list)
    for a in annotations:
        if a.get("iscrowd", 0):
            continue
        if a.get("num_keypoints", int((np.asarray(a["keypoints"])[2::3] > 0).sum())) < 1:
            continue
        gts_by_img[a["image_id"]].append(a)
    preds_by_img = defaultdict(list)
    for p in predictions:
        preds_by_img[p["image_id"]].append(p)

    out: Dict[str, float] = {}
    for area_name, (lo, hi) in AREA_RANGES.items():
        # evaluate each image: oks matrix -> greedy match per threshold
        scores_all: List[float] = []
        matches_all: List[np.ndarray] = []  # (T,) bool per prediction
        n_gt = 0
        recalls_hit = np.zeros((len(thresholds),))  # matched gts per thr
        for img_id, gts in gts_by_img.items():
            in_range = [g for g in gts
                        if lo <= g.get("area", 0.0) < hi]
            n_gt_img = len(in_range)
            n_gt += n_gt_img
            preds = sorted(preds_by_img.get(img_id, []),
                           key=lambda p: -p["score"])
            if not preds:
                continue
            oks = np.zeros((len(preds), n_gt_img))
            for i, p in enumerate(preds):
                pk = np.asarray(p["keypoints"], np.float32).reshape(-1, 3)
                for j, g in enumerate(in_range):
                    gk = np.asarray(g["keypoints"], np.float32).reshape(-1, 3)
                    oks[i, j] = compute_oks(pk, gk, g.get("area", 0.0))
            for i, p in enumerate(preds):
                scores_all.append(p["score"])
                matches_all.append(np.zeros(len(thresholds), bool))
            base = len(scores_all) - len(preds)
            for t, thr in enumerate(thresholds):
                used = set()
                for i in range(len(preds)):  # score order
                    if n_gt_img == 0:
                        break
                    j_best, v_best = -1, thr
                    for j in range(n_gt_img):
                        if j in used:
                            continue
                        if oks[i, j] >= v_best:
                            j_best, v_best = j, oks[i, j]
                    if j_best >= 0:
                        used.add(j_best)
                        matches_all[base + i][t] = True
                recalls_hit[t] += 0  # recall computed from TP cumsum below

        suffix = {"all": "", "medium": "m", "large": "l"}[area_name]
        if n_gt == 0 or not scores_all:
            for k in ("AP", "AR"):
                out[f"{k}{suffix}"] = 0.0
            if area_name == "all":
                out.update({"AP50": 0.0, "AP75": 0.0, "AR50": 0.0, "AR75": 0.0})
            continue

        scores = np.asarray(scores_all)
        tp = np.stack(matches_all)  # (N, T)
        order = np.argsort(-scores)
        tp = tp[order]

        aps, ars = [], []
        for t in range(len(thresholds)):
            tpc = tp[:, t].cumsum()
            fpc = (~tp[:, t]).cumsum()
            recall = tpc / n_gt
            precision = tpc / np.maximum(tpc + fpc, 1e-9)
            aps.append(_interp_ap(recall, precision))
            ars.append(float(recall[-1]))

        out[f"AP{suffix}"] = float(np.mean(aps))
        out[f"AR{suffix}"] = float(np.mean(ars))
        if area_name == "all":
            out["AP50"] = aps[0]
            out["AP75"] = aps[5]
            out["AR50"] = ars[0]
            out["AR75"] = ars[5]
    return out
