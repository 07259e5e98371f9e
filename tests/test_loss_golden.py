"""Golden: the full YOLO detection training loss vs a line-level numpy
transcription of the reference ComputeLoss/BoxLoss/Assigner chain
(tests/ref_yolo.py; reference training/yolopt/util.py:482-769). This is the
end-to-end guarantee on top of the per-op goldens (TAL assigner loops,
CIoU brute force, DFL formula): raw multi-level maps + padded gt batches in,
three gained loss scalars out, equal to fp64 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from prpe_tpu.ops.losses import yolo_detection_loss
from tests.ref_yolo import ref_compute_loss

NC, REG_MAX = 3, 16
STRIDES = (8, 16)
LEVEL_HW = ((8, 8), (4, 4))


def _scene(seed):
    rng = np.random.default_rng(seed)
    b, m = 2, 4
    no = 4 * REG_MAX + NC
    maps = [rng.normal(0, 0.7, size=(b, h, w, no)).astype(np.float32)
            for h, w in LEVEL_HW]
    cxy = rng.uniform(0.15, 0.85, size=(b, m, 2))
    wh = rng.uniform(0.1, 0.5, size=(b, m, 2))
    gt_boxes = np.concatenate([cxy, wh], -1).astype(np.float32)
    gt_labels = rng.integers(0, NC, size=(b, m))
    gt_mask = np.ones((b, m), bool)
    gt_mask[:, -1] = False
    gt_boxes[~gt_mask] = 0.0
    return maps, gt_labels, gt_boxes, gt_mask


def test_detection_loss_matches_reference_transcription():
    for seed in range(4):
        maps, gt_labels, gt_boxes, gt_mask = _scene(seed)
        got = jax.jit(
            lambda *a: yolo_detection_loss(
                a[:2], a[2], a[3], a[4],
                num_classes=NC, strides=STRIDES, reg_max=REG_MAX,
                box_gain=7.5, cls_gain=0.5, dfl_gain=1.5,
            )
        )(jnp.asarray(maps[0]), jnp.asarray(maps[1]),
          jnp.asarray(gt_labels), jnp.asarray(gt_boxes), jnp.asarray(gt_mask))

        nchw = [m.transpose(0, 3, 1, 2).astype(np.float64) for m in maps]
        want_box, want_cls, want_dfl = ref_compute_loss(
            nchw, gt_labels, gt_boxes.astype(np.float64), gt_mask,
            nc=NC, reg_max=REG_MAX, strides=STRIDES,
            box_gain=7.5, cls_gain=0.5, dfl_gain=1.5,
        )
        np.testing.assert_allclose(float(got.cls), want_cls, rtol=2e-4,
                                   err_msg=f"cls seed {seed}")
        np.testing.assert_allclose(float(got.box), want_box, rtol=2e-4,
                                   err_msg=f"box seed {seed}")
        np.testing.assert_allclose(float(got.dfl), want_dfl, rtol=2e-4,
                                   err_msg=f"dfl seed {seed}")
        np.testing.assert_allclose(
            float(got.total), want_box + want_cls + want_dfl, rtol=2e-4)


def test_detection_loss_no_valid_gt():
    """All-padded gt batch: box/dfl zero, cls = sum BCE / 1 (the reference's
    target_scores_sum floor of 1, util.py:751)."""
    maps, gt_labels, gt_boxes, gt_mask = _scene(0)
    gt_mask[:] = False
    gt_boxes[:] = 0.0
    got = yolo_detection_loss(
        [jnp.asarray(m) for m in maps], jnp.asarray(gt_labels),
        jnp.asarray(gt_boxes), jnp.asarray(gt_mask),
        num_classes=NC, strides=STRIDES, reg_max=REG_MAX,
        box_gain=7.5, cls_gain=0.5, dfl_gain=1.5,
    )
    assert float(got.box) == 0.0 and float(got.dfl) == 0.0
    nchw = [m.transpose(0, 3, 1, 2).astype(np.float64) for m in maps]
    want_box, want_cls, want_dfl = ref_compute_loss(
        nchw, gt_labels, gt_boxes.astype(np.float64), gt_mask,
        nc=NC, reg_max=REG_MAX, strides=STRIDES,
        box_gain=7.5, cls_gain=0.5, dfl_gain=1.5,
    )
    np.testing.assert_allclose(float(got.cls), want_cls, rtol=2e-4)
    assert want_box == 0.0 and want_dfl == 0.0
