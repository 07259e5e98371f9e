"""Behavioral tests for the vectorized TAL assigner."""

import jax
import jax.numpy as jnp
import numpy as np

from prpe_tpu.ops import anchors as anchor_ops
from prpe_tpu.ops import assigner


def build_scene():
    """1 image, a 16x16 grid of stride-8 anchors, 2 gts + 1 pad slot."""
    ap, st = anchor_ops.make_anchors([(16, 16)], [8])
    ap_abs = np.asarray(ap) * 8.0
    a = ap_abs.shape[0]
    nc = 3

    gt_boxes = np.array(
        [[[8.0, 8.0, 56.0, 56.0], [60.0, 60.0, 120.0, 120.0], [0, 0, 0, 0]]],
        np.float32,
    )
    gt_labels = np.array([[1, 2, 0]], np.int64)
    gt_mask = np.array([[True, True, False]])

    # predictions: boxes == anchor-centered squares, score high for true class
    pd_boxes = np.concatenate([ap_abs - 12.0, ap_abs + 12.0], -1)[None]  # (1,A,4)
    pd_scores = np.full((1, a, nc), 0.1, np.float32)
    return ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask


def run(ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask, **kw):
    return jax.jit(
        lambda *args: assigner.assign(*args, num_classes=3, **kw)
    )(
        jnp.asarray(pd_scores),
        jnp.asarray(pd_boxes),
        jnp.asarray(ap_abs),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_mask),
    )


def test_assigns_inside_anchors_only():
    ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask = build_scene()
    res = run(ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask, top_k=5)
    fg = np.asarray(res.fg_mask[0])
    assert fg.sum() > 0
    # every fg anchor center must lie inside one of the valid gts
    centers = ap_abs[fg]
    inside = np.zeros(len(centers), bool)
    for b in np.asarray(gt_boxes[0][:2]):
        inside |= (
            (centers[:, 0] > b[0]) & (centers[:, 0] < b[2])
            & (centers[:, 1] > b[1]) & (centers[:, 1] < b[3])
        )
    assert inside.all()


def test_topk_bounds_assignment_count():
    ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask = build_scene()
    res = run(ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask, top_k=5)
    # at most top_k anchors per valid gt
    assert int(np.asarray(res.fg_mask).sum()) <= 5 * 2


def test_padded_gt_assigns_nothing():
    ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask = build_scene()
    gt_mask = np.array([[False, False, False]])
    res = run(ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask)
    assert int(np.asarray(res.fg_mask).sum()) == 0
    assert float(np.asarray(res.target_scores).sum()) == 0.0


def test_fg_targets_have_gt_class():
    ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask = build_scene()
    res = run(ap_abs, pd_scores, pd_boxes, gt_labels, gt_boxes, gt_mask, top_k=5)
    fg = np.asarray(res.fg_mask[0])
    ts = np.asarray(res.target_scores[0])
    # non-fg anchors carry zero scores
    assert ts[~fg].sum() == 0.0
    # fg anchors: the argmax class is one of the valid gt labels
    cls = ts[fg].argmax(-1)
    assert set(cls).issubset({1, 2})
    # scores are alignment-normalized into (0, 1]
    assert ts[fg].max() <= 1.0 + 1e-6


def test_conflict_resolves_to_max_iou():
    """An anchor claimed by two gts goes to the higher-IoU one."""
    ap = np.array([[32.0, 32.0]], np.float32)  # single anchor at (32, 32)
    # gt0 tightly matches the prediction, gt1 is huge (low IoU with pred)
    gt_boxes = np.array([[[20, 20, 44, 44], [0, 0, 128, 128]]], np.float32)
    gt_labels = np.array([[0, 1]])
    gt_mask = np.array([[True, True]])
    pd_boxes = np.array([[[20.0, 20.0, 44.0, 44.0]]], np.float32)
    pd_scores = np.full((1, 1, 3), 0.9, np.float32)
    res = jax.jit(lambda *a: assigner.assign(*a, num_classes=3, top_k=1))(
        jnp.asarray(pd_scores), jnp.asarray(pd_boxes), jnp.asarray(ap),
        jnp.asarray(gt_labels), jnp.asarray(gt_boxes), jnp.asarray(gt_mask),
    )
    assert bool(res.fg_mask[0, 0])
    np.testing.assert_allclose(
        np.asarray(res.target_bboxes[0, 0]), [20, 20, 44, 44]
    )
    assert int(np.asarray(res.target_scores[0, 0]).argmax()) == 0


def test_assigner_matches_naive_reference(rng):
    """Golden: the vectorized assigner vs a loop-based transcription of the
    reference algorithm (training/yolopt/util.py:482-574)."""
    from prpe_tpu.ops.boxes import ciou as ciou_op

    nc, top_k, alpha, beta, eps = 3, 4, 0.5, 6.0, 1e-9
    ap, st = anchor_ops.make_anchors([(8, 8)], [8])
    ap_abs = np.asarray(ap) * 8.0
    a = ap_abs.shape[0]
    b, m = 2, 5

    cxy = rng.uniform(8, 56, size=(b, m, 2))
    wh = rng.uniform(10, 40, size=(b, m, 2))
    gt_boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    gt_labels = rng.integers(0, nc, size=(b, m))
    gt_mask = np.ones((b, m), bool)
    gt_mask[:, -1] = False
    pd_cxy = ap_abs[None] + rng.normal(0, 2, (b, a, 2))
    pd_wh = rng.uniform(8, 48, size=(b, a, 2))
    pd_boxes = np.concatenate([pd_cxy - pd_wh / 2, pd_cxy + pd_wh / 2], -1).astype(np.float32)
    pd_scores = rng.uniform(0.01, 0.99, size=(b, a, nc)).astype(np.float32)

    got = jax.jit(
        lambda *args: assigner.assign(
            *args, num_classes=nc, top_k=top_k, alpha=alpha, beta=beta)
    )(jnp.asarray(pd_scores), jnp.asarray(pd_boxes), jnp.asarray(ap_abs),
      jnp.asarray(gt_labels), jnp.asarray(gt_boxes), jnp.asarray(gt_mask))

    pair_ciou = np.clip(np.asarray(
        ciou_op(jnp.asarray(gt_boxes)[:, :, None, :],
                jnp.asarray(pd_boxes)[:, None, :, :])), 0.0, None)

    for bi in range(b):
        # candidate mask + alignment metric, per gt
        cand = np.zeros((m, a)); metric = np.zeros((m, a)); ovl = np.zeros((m, a))
        for mi in range(m):
            if not gt_mask[bi, mi]:
                continue
            x1, y1, x2, y2 = gt_boxes[bi, mi]
            inside = ((ap_abs[:, 0] - x1 > eps) & (ap_abs[:, 1] - y1 > eps)
                      & (x2 - ap_abs[:, 0] > eps) & (y2 - ap_abs[:, 1] > eps))
            cand[mi] = inside
            ovl[mi] = pair_ciou[bi, mi] * inside
            s = pd_scores[bi, :, gt_labels[bi, mi]] * inside
            metric[mi] = s**alpha * ovl[mi]**beta
        # per-gt top-k, drop anchors chosen twice within one gt's k slots
        mask_pos = np.zeros((m, a))
        for mi in range(m):
            if not gt_mask[bi, mi]:
                continue
            order = np.argsort(-metric[mi], kind="stable")[:top_k]
            cnt = np.bincount(order, minlength=a)
            mask_pos[mi] = (cnt == 1) * cand[mi]
        # multi-gt anchors -> max-overlap gt wins
        for ai in range(a):
            if mask_pos[:, ai].sum() > 1:
                win = int(np.argmax(ovl[:, ai]))
                mask_pos[:, ai] = 0
                mask_pos[win, ai] = 1
        fg = mask_pos.sum(0) > 0
        np.testing.assert_array_equal(np.asarray(got.fg_mask[bi]), fg)
        # assigned gt + its box
        tgt = mask_pos.argmax(0)
        np.testing.assert_allclose(
            np.asarray(got.target_bboxes[bi]), gt_boxes[bi][tgt], atol=1e-5)
        # normalized target scores
        am = metric * mask_pos
        want_scores = np.zeros((a, nc))
        for ai in range(a):
            if not fg[ai]:
                continue
            mi = tgt[ai]
            pos_align = am[mi].max()
            pos_ovl = (ovl[mi] * mask_pos[mi]).max()
            norm = (am[:, ai] * pos_ovl / (pos_align + eps)).max()
            want_scores[ai, gt_labels[bi, mi]] = norm
        np.testing.assert_allclose(
            np.asarray(got.target_scores[bi]), want_scores, atol=1e-4)
