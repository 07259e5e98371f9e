"""Golden validation of the detection mAP stack vs a line-level
transcription of the reference's compute_metric + compute_ap
(training/yolopt/util.py:99-120, :225-302, smooth :172-177). Same approach
as tests/test_keypoint_eval.py: the transcription is written clause by
clause like the public source (numpy in place of torch) so it can be
diffed; prpe_tpu/eval/map.py must agree bit-for-bit across randomized
multi-overlap scenes — including the reference's unique-chain matching
quirk, where a gt contested by several dets goes to the lowest-index det,
not the highest-IoU one."""

import numpy as np

from prpe_tpu.eval.map import (
    IOU_THRESHOLDS, compute_ap, evaluate_detections, match_detections,
)


def _iou_matrix(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.clip(rb - lt, 0, None).prod(2)
    return inter / (
        (a[:, 2:] - a[:, :2]).prod(1)[:, None]
        + (b[:, 2:] - b[:, :2]).prod(1)[None, :] - inter + 1e-7)


def ref_compute_metric(output, target, iou_v):
    """util.py:99-121 — output rows [x1 y1 x2 y2 conf cls], target [cls x1 y1 x2 y2]."""
    iou = _iou_matrix(target[:, 1:], output[:, :4])
    correct = np.zeros((output.shape[0], iou_v.shape[0])).astype(bool)
    for i in range(len(iou_v)):
        x = np.where((iou >= iou_v[i]) & (target[:, 0:1] == output[:, 5]))
        if x[0].shape[0]:
            matches = np.concatenate(
                (np.stack(x, 1), iou[x[0], x[1]][:, None]), 1)  # [label, detect, iou]
            if x[0].shape[0] > 1:
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
            correct[matches[:, 1].astype(int), i] = True
    return correct


def ref_smooth(y, f=0.1):
    nf = round(len(y) * f * 2) // 2 + 1
    p = np.ones(nf // 2)
    yp = np.concatenate((p * y[0], y, p * y[-1]), 0)
    return np.convolve(yp, np.ones(nf) / nf, mode="valid")


def ref_compute_ap(tp, conf, output, target, eps=1e-16):
    """util.py:225-302, minus plotting."""
    i = np.argsort(-conf)
    tp, conf, output = tp[i], conf[i], output[i]
    unique_classes, nt = np.unique(target, return_counts=True)
    nc = unique_classes.shape[0]
    p = np.zeros((nc, 1000))
    r = np.zeros((nc, 1000))
    ap = np.zeros((nc, tp.shape[1]))
    px = np.linspace(start=0, stop=1, num=1000)
    for ci, c in enumerate(unique_classes):
        i = output == c
        nl = nt[ci]
        no = i.sum()
        if no == 0 or nl == 0:
            continue
        fpc = (1 - tp[i]).cumsum(0)
        tpc = tp[i].cumsum(0)
        recall = tpc / (nl + eps)
        r[ci] = np.interp(-px, -conf[i], recall[:, 0], left=0)
        precision = tpc / (tpc + fpc)
        p[ci] = np.interp(-px, -conf[i], precision[:, 0], left=1)
        for j in range(tp.shape[1]):
            m_rec = np.concatenate(([0.0], recall[:, j], [1.0]))
            m_pre = np.concatenate(([1.0], precision[:, j], [0.0]))
            m_pre = np.flip(np.maximum.accumulate(np.flip(m_pre)))
            x = np.linspace(start=0, stop=1, num=101)
            ap[ci, j] = np.trapezoid(np.interp(x, m_rec, m_pre), x)
    f1 = 2 * p * r / (p + r + eps)
    i = ref_smooth(f1.mean(0), 0.1).argmax()
    p, r, f1 = p[:, i], r[:, i], f1[:, i]
    ap50, ap_mean = ap[:, 0], ap.mean(1)
    return p.mean(), r.mean(), f1.mean(), ap50.mean(), ap[:, 5].mean(), ap_mean.mean()


def _scene(seed, nc=3):
    rng = np.random.default_rng(seed)
    images = []
    for _ in range(rng.integers(2, 5)):
        n_gt = int(rng.integers(0, 6))
        gt = np.zeros((n_gt, 4), np.float32)
        gt_cls = rng.integers(0, nc, n_gt).astype(np.float32)
        for i in range(n_gt):
            x, y = rng.uniform(0, 500, 2)
            w, h = rng.uniform(20, 120, 2)
            gt[i] = [x, y, x + w, y + h]
        # detections: jittered copies (some overlapping one gt heavily,
        # exercising the unique-chain quirk) + random false positives
        dets, scores, cls = [], [], []
        for i in range(n_gt):
            for _ in range(int(rng.integers(0, 3))):
                j = rng.uniform(-15, 15, 4)
                dets.append(gt[i] + j)
                scores.append(rng.uniform(0.05, 1.0))
                cls.append(gt_cls[i] if rng.random() < 0.9
                           else rng.integers(0, nc))
        for _ in range(int(rng.integers(0, 3))):
            x, y = rng.uniform(0, 500, 2)
            w, h = rng.uniform(20, 120, 2)
            dets.append([x, y, x + w, y + h])
            scores.append(rng.uniform(0.05, 1.0))
            cls.append(rng.integers(0, nc))
        det = np.asarray(dets, np.float32).reshape(-1, 4)
        scores = np.asarray(scores, np.float32)
        cls = np.asarray(cls, np.float32)
        order = np.argsort(-scores)  # score-descending, like the NMS output
        images.append((det[order], scores[order], cls[order], gt, gt_cls))
    return images


def test_matching_matches_reference_transcription():
    for seed in range(20):
        for det, scores, cls, gt, gt_cls in _scene(seed):
            got = match_detections(det, cls, gt, gt_cls)
            out6 = np.concatenate(
                [det, scores[:, None], cls[:, None]], 1)
            tgt = np.concatenate([gt_cls[:, None], gt], 1)
            want = ref_compute_metric(out6, tgt, IOU_THRESHOLDS)
            np.testing.assert_array_equal(got, want, err_msg=f"seed {seed}")


def test_ap_suite_matches_reference_transcription():
    checked = 0
    for seed in range(12):
        images = _scene(seed)
        m = evaluate_detections(images)
        tp = np.concatenate([
            match_detections(d, c, g, gc) for d, s, c, g, gc in images])
        conf = np.concatenate([s for _, s, *_ in images])
        cls = np.concatenate([c for _, _, c, *_ in images])
        gt_cls = np.concatenate([gc for *_, gc in images])
        if len(tp) == 0 or len(gt_cls) == 0:
            continue
        pm, rm, f1m, map50, map75, mean_ap = ref_compute_ap(
            tp, conf, cls, gt_cls)
        np.testing.assert_allclose(m["precision"], pm, atol=1e-12)
        np.testing.assert_allclose(m["recall"], rm, atol=1e-12)
        np.testing.assert_allclose(m["f1"], f1m, atol=1e-12)
        np.testing.assert_allclose(m["mAP50"], map50, atol=1e-12)
        np.testing.assert_allclose(m["mAP75"], map75, atol=1e-12)
        np.testing.assert_allclose(m["mAP50-95"], mean_ap, atol=1e-12)
        checked += 1
    assert checked >= 10
