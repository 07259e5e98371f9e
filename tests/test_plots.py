"""Detection curve plotting + the standalone trainer's --test entry.

Covers the reference's plot artifacts (training/yolopt/util.py:180-222:
PR_curve/F1_curve/P_curve/R_curve PNGs written by compute_ap(plot=True))
and its eval-only test() CLI (training/yolopt/main.py:169-239).
"""

import numpy as np
import pytest

from prpe_tpu.eval.map import DetectionCurves, evaluate_detections
from prpe_tpu.eval.plots import save_detection_curves


def _synthetic_per_image(seed=0, n_images=6, n_det=12, n_gt=5):
    rng = np.random.default_rng(seed)
    per_image = []
    for _ in range(n_images):
        gt = rng.uniform(50, 400, (n_gt, 2))
        gt_boxes = np.concatenate([gt, gt + rng.uniform(40, 120, (n_gt, 2))], -1)
        gt_classes = rng.integers(0, 2, n_gt).astype(np.float32)
        # half the detections sit on gts (jittered), half are noise
        k = min(n_det // 2, n_gt)
        det_boxes = np.concatenate([
            gt_boxes[:k] + rng.normal(0, 3, (k, 4)),
            rng.uniform(0, 500, (n_det - k, 4)),
        ])
        det_boxes[:, 2:] = np.maximum(det_boxes[:, 2:], det_boxes[:, :2] + 1)
        scores = np.sort(rng.uniform(0.05, 0.95, len(det_boxes)))[::-1]
        classes = rng.integers(0, 2, len(det_boxes)).astype(np.float32)
        per_image.append((det_boxes.astype(np.float32), scores.astype(np.float32),
                          classes, gt_boxes.astype(np.float32), gt_classes))
    return per_image


def test_return_curves_preserves_metrics():
    per_image = _synthetic_per_image()
    plain = evaluate_detections(per_image)
    with_curves, curves = evaluate_detections(per_image, return_curves=True)
    assert plain == with_curves
    assert isinstance(curves, DetectionCurves)
    c = len(curves.classes)
    assert curves.precision.shape == (c, 1000)
    assert curves.recall.shape == (c, 1000)
    assert curves.f1.shape == (c, 1000)
    assert curves.pr_precision.shape == (c, 1000)
    assert curves.ap.shape[0] == c
    # recall decreases as confidence rises; precision envelope is monotone
    assert curves.recall[:, 0].min() >= curves.recall[:, -1].max() - 1e-6
    assert np.all(np.diff(curves.pr_precision, axis=1) <= 1e-6)


def test_empty_inputs_return_none_curves():
    metrics, curves = evaluate_detections([], return_curves=True)
    assert metrics["mAP50"] == 0.0
    assert curves is None
    assert save_detection_curves(None, "/nonexistent/never/created") == {}


def test_save_detection_curves_writes_pngs(tmp_path):
    _, curves = evaluate_detections(_synthetic_per_image(), return_curves=True)
    paths = save_detection_curves(curves, tmp_path, names=["person", "face"])
    assert set(paths) == {"PR_curve", "F1_curve", "P_curve", "R_curve"}
    for p in paths.values():
        f = tmp_path / p.split("/")[-1]
        assert f.exists() and f.stat().st_size > 1000  # real PNG, not stub


@pytest.mark.slow
def test_train_yolo_cli_test_mode(tmp_path):
    """1 synthetic epoch at 64^2, then the --test eval-only entry: metrics
    table printed, curve PNGs written next to the checkpoints."""
    from prpe_tpu.cli.train_yolo import main

    out = tmp_path / "weights"
    common = ["--synthetic", "--input-size", "64", "--batch-size", "4",
              "--num-classes", "1", "--output-dir", str(out)]
    assert main(common + ["--epochs", "1"]) == 0
    assert (out / "best").exists()
    assert main(common + ["--test", "--class-names", "person"]) == 0
    for name in ("PR_curve.png", "F1_curve.png", "P_curve.png", "R_curve.png"):
        assert (out / name).exists()
