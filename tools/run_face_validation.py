"""Focused face-recognition training run (VERDICT r4 item 2).

Validates the round-4 eval fix at scale: trains ONLY the face_recognition
task (``cli.train --tasks face_recognition``) on a synthetic identity set
with hundreds of classes, then asserts from the committed history CSV that

  * the margin-free ``val/acc`` (the reference's validation metric,
    face_recognition/module.py:119-157) RISES with training,
  * ``val/acc_margin`` (the old buggy metric: argmax over margin-penalized
    training logits) sits BELOW val/acc — the exact divergence the bug
    analysis predicts (the margin subtracts from the true class, biasing
    argmax against it),
  * the LFW-protocol k-fold verification accuracy (``val/ver_acc``,
    eval/verification.py) rises above chance.

Usage:
  python tools/run_face_validation.py [--ids 256] [--per-id 12]
                                      [--epochs 20] [--out runs/r5_face_validation]
"""

from __future__ import annotations

import argparse
import csv
import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ids", type=int, default=256)
    ap.add_argument("--per-id", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--data", default="/tmp/synth_faces_r5")
    ap.add_argument("--out", default=str(ROOT / "runs" / "r5_face_validation"))
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()

    data = pathlib.Path(args.data)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if not args.summarize_only:
        if not (data / "imgs").exists():
            sys.path.insert(0, str(ROOT / "tools"))
            from make_synthetic_multitask_data import make_faces

            make_faces(data, n_ids=args.ids, per_id=args.per_id)

        cmd = [
            sys.executable, "-m", "prpe_tpu.cli.train",
            "--tasks", "face_recognition",
            "--epochs", str(args.epochs),
            "--batch-size", str(args.batch_size),
            "--learning-rate", "1e-3",
            "--image-size", str(args.image_size),
            "--face-rec-data-dir", str(data),
            "--max-train-samples", str(args.ids * args.per_id),
            "--max-val-samples", "512",
            "--checkpoint-dir", str(out / "ckpt"),
            "--log-dir", str(out),
            "--component-dir", "/tmp/none",
            "--device-resident",
            "--save-every", str(max(args.epochs, 1)),
        ]
        if args.model_parallel > 1:
            cmd += ["--model-parallel", str(args.model_parallel),
                    "--data-parallel", "-1"]
        log = out / "train.log"
        print(f"[face-validation] training ({args.ids} ids x {args.per_id}, "
              f"{args.epochs} epochs) -> {log}", flush=True)
        r = subprocess.run(cmd, cwd=ROOT, stdout=log.open("w"),
                           stderr=subprocess.STDOUT)
        if r.returncode != 0:
            print(log.read_text()[-3000:])
            raise SystemExit(f"training failed rc={r.returncode}")

    rows = list(csv.DictReader((out / "face_recognition_history.csv").open()))

    def curve(col):
        return [float(r[col]) for r in rows if r.get(col) not in (None, "")]

    acc = curve("val/acc")
    accm = curve("val/acc_margin")
    ver = curve("val/ver_acc")
    k = min(3, len(acc))
    summary = {
        "ids": args.ids, "epochs": len(acc),
        "val_acc_first3": round(sum(acc[:k]) / k, 4),
        "val_acc_last3": round(sum(acc[-k:]) / k, 4),
        "val_acc_margin_last3": round(sum(accm[-k:]) / k, 4),
        "val_ver_acc_first3": round(sum(ver[:k]) / k, 4) if ver else None,
        "val_ver_acc_last3": round(sum(ver[-k:]) / k, 4) if ver else None,
        "acc_curve": [round(v, 4) for v in acc],
        "acc_margin_curve": [round(v, 4) for v in accm],
        "ver_acc_curve": [round(v, 4) for v in ver],
        "checks": {},
    }
    chance = 1.0 / args.ids
    summary["checks"]["val_acc_rises"] = bool(
        summary["val_acc_last3"] > max(summary["val_acc_first3"], 2 * chance))
    # the buggy metric must sit below the fixed one once the model has
    # learned (margin penalization biases argmax against the true class)
    summary["checks"]["margin_metric_below_fixed"] = bool(
        summary["val_acc_margin_last3"] < summary["val_acc_last3"])
    summary["checks"]["verification_above_chance"] = bool(
        ver and summary["val_ver_acc_last3"] > 0.6)
    summary["pass"] = all(summary["checks"].values())
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items()
                      if not k.endswith("curve")}, indent=2))
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
