"""Numpy transcriptions of the reference YOLO training math, for golden
tests only. Written clause-by-clause against the public source so they can
be diffed: compute_iou/CIoU (training/yolopt/util.py:303-329), make_anchors
(:85-96), DFL box_decode (:692-700), the TAL Assigner's selection rules
(:482-574, as loop code), and ComputeLoss/BoxLoss (:637-769)."""

import math

import numpy as np


def ref_ciou(box1, box2, eps=1e-7):
    """util.py:303-329 — elementwise CIoU of (..., 4) xyxy boxes,
    including the reference's quirks (eps added to heights only, alpha
    detached)."""
    b1_x1, b1_y1, b1_x2, b1_y2 = np.moveaxis(box1, -1, 0)
    b2_x1, b2_y1, b2_x2, b2_y2 = np.moveaxis(box2, -1, 0)
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    inter = np.clip(np.minimum(b1_x2, b2_x2) - np.maximum(b1_x1, b2_x1), 0, None) \
        * np.clip(np.minimum(b1_y2, b2_y2) - np.maximum(b1_y1, b2_y1), 0, None)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = np.maximum(b1_x2, b2_x2) - np.minimum(b1_x1, b2_x1)
    ch = np.maximum(b1_y2, b2_y2) - np.minimum(b1_y1, b2_y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
            + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    v = (4 / math.pi**2) * (np.arctan(w2 / h2) - np.arctan(w1 / h1)) ** 2
    alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + v * alpha)


def ref_make_anchors(level_hw, strides, offset=0.5):
    """util.py:85-96."""
    anchor_points, stride_tensor = [], []
    for (h, w), stride in zip(level_hw, strides):
        sx = np.arange(w, dtype=np.float64) + offset
        sy = np.arange(h, dtype=np.float64) + offset
        sy, sx = np.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(np.stack((sx, sy), -1).reshape(-1, 2))
        stride_tensor.append(np.full((h * w, 1), stride, np.float64))
    return np.concatenate(anchor_points), np.concatenate(stride_tensor)


def ref_box_decode(anchor_points, pred_dist, reg_max):
    """ComputeLoss.box_decode (util.py:692-700): softmax over bins,
    expectation, anchor +/- lt/rb — grid units."""
    b, a, c = pred_dist.shape
    d = pred_dist.reshape(b, a, 4, c // 4)
    e = np.exp(d - d.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    proj = np.arange(reg_max, dtype=np.float64)
    dist = (p * proj).sum(-1)  # (B, A, 4)
    lt, rb = dist[..., :2], dist[..., 2:]
    return np.concatenate([anchor_points - lt, anchor_points + rb], -1)


def naive_assign(pd_scores, pd_boxes, ap_abs, gt_labels, gt_boxes, gt_mask,
                 nc, top_k=10, alpha=0.5, beta=6.0, eps=1e-9):
    """Loop transcription of Assigner (util.py:482-574), one batch at a
    time. pd_boxes/gt_boxes absolute xyxy; ap_abs absolute anchor centers.
    Returns (target_bboxes (B,A,4), target_scores (B,A,nc), fg (B,A))."""
    b, a, _ = pd_scores.shape
    m = gt_boxes.shape[1]
    out_boxes = np.zeros((b, a, 4))
    out_scores = np.zeros((b, a, nc))
    out_fg = np.zeros((b, a), bool)
    for bi in range(b):
        cand = np.zeros((m, a))
        metric = np.zeros((m, a))
        ovl = np.zeros((m, a))
        for mi in range(m):
            if not gt_mask[bi, mi]:
                continue
            x1, y1, x2, y2 = gt_boxes[bi, mi]
            inside = ((ap_abs[:, 0] - x1 > eps) & (ap_abs[:, 1] - y1 > eps)
                      & (x2 - ap_abs[:, 0] > eps) & (y2 - ap_abs[:, 1] > eps))
            cand[mi] = inside
            ovl[mi] = np.clip(
                ref_ciou(gt_boxes[bi, mi][None, :], pd_boxes[bi]), 0, None
            ) * inside
            s = pd_scores[bi, :, gt_labels[bi, mi]] * inside
            metric[mi] = s**alpha * ovl[mi]**beta
        mask_pos = np.zeros((m, a))
        for mi in range(m):
            if not gt_mask[bi, mi]:
                continue
            order = np.argsort(-metric[mi], kind="stable")[:top_k]
            cnt = np.bincount(order, minlength=a)
            mask_pos[mi] = (cnt == 1) * cand[mi]
        for ai in range(a):
            if mask_pos[:, ai].sum() > 1:
                win = int(np.argmax(ovl[:, ai]))
                mask_pos[:, ai] = 0
                mask_pos[win, ai] = 1
        fg = mask_pos.sum(0) > 0
        tgt = mask_pos.argmax(0)
        am = metric * mask_pos
        for ai in range(a):
            if not fg[ai]:
                continue
            mi = tgt[ai]
            pos_align = am[mi].max()
            pos_ovl = (ovl[mi] * mask_pos[mi]).max()
            norm = (am[:, ai] * pos_ovl / (pos_align + eps)).max()
            out_scores[bi, ai, gt_labels[bi, mi]] = norm
            out_boxes[bi, ai] = gt_boxes[bi, mi]
        out_fg[bi] = fg
    return out_boxes, out_scores, out_fg


def _bce_with_logits(x, z):
    return np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x)))


def _cross_entropy(logits, idx):
    lse = logits.max(-1) + np.log(
        np.exp(logits - logits.max(-1, keepdims=True)).sum(-1))
    return lse - np.take_along_axis(logits, idx[..., None], -1)[..., 0]


def ref_compute_loss(outputs_nchw, gt_labels, gt_boxes_cxcywh_norm, gt_mask,
                     nc, reg_max, strides, box_gain, cls_gain, dfl_gain,
                     top_k=10, alpha=0.5, beta=6.0):
    """ComputeLoss.__call__ + BoxLoss (util.py:637-769) in numpy.

    outputs_nchw: per-level (B, no, H, W) raw maps (torch layout).
    Returns (loss_box, loss_cls, loss_dfl) after gains.
    """
    b = outputs_nchw[0].shape[0]
    no = 4 * reg_max + nc
    x = np.concatenate([o.reshape(b, no, -1) for o in outputs_nchw], axis=2)
    pred_distri = x[:, : reg_max * 4].transpose(0, 2, 1).astype(np.float64)
    pred_scores = x[:, reg_max * 4:].transpose(0, 2, 1).astype(np.float64)

    level_hw = [o.shape[2:] for o in outputs_nchw]
    input_size = np.array(level_hw[0], np.float64) * strides[0]  # (H, W)
    anchor_points, stride_tensor = ref_make_anchors(level_hw, strides)

    # gt: normalized cxcywh * input_size[[1,0,1,0]] -> absolute xyxy
    scale = input_size[[1, 0, 1, 0]]
    gx = gt_boxes_cxcywh_norm * scale
    gt_xyxy = np.concatenate(
        [gx[..., :2] - gx[..., 2:] / 2, gx[..., :2] + gx[..., 2:] / 2], -1)
    mask_gt = gt_mask & (np.abs(gt_xyxy).sum(-1) > 0)

    pred_bboxes = ref_box_decode(anchor_points, pred_distri, reg_max)
    sig = 1.0 / (1.0 + np.exp(-pred_scores))
    target_bboxes, target_scores, fg = naive_assign(
        sig, pred_bboxes * stride_tensor, anchor_points * stride_tensor,
        gt_labels, gt_xyxy, mask_gt, nc, top_k, alpha, beta)

    tss = max(target_scores.sum(), 1.0)
    loss_cls = _bce_with_logits(pred_scores, target_scores).sum() / tss

    loss_box = 0.0
    loss_dfl = 0.0
    if fg.sum():
        tb = target_bboxes / stride_tensor
        weight = (target_scores.sum(-1))[fg][:, None]
        iou = ref_ciou(pred_bboxes[fg], tb[fg])
        loss_box = ((1.0 - iou) * weight[:, 0]).sum() / tss

        a_pts = np.broadcast_to(anchor_points, tb[..., :2].shape)
        target = np.concatenate(
            [a_pts - tb[..., :2], tb[..., 2:] - a_pts], -1)
        target = np.clip(target, 0, (reg_max - 1) - 0.01)
        pd = pred_distri[fg].reshape(-1, 4, reg_max)
        t = target[fg]
        tl = t.astype(np.int64)
        tr = tl + 1
        wl = tr - t
        wr = 1 - wl
        left = _cross_entropy(pd, tl)
        right = _cross_entropy(pd, tr)
        per = (left * wl + right * wr).mean(-1)
        loss_dfl = (per * weight[:, 0]).sum() / tss

    return loss_box * box_gain, loss_cls * cls_gain, loss_dfl * dfl_gain
