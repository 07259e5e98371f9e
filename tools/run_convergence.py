"""Round-robin convergence artifact driver (VERDICT r2 item 3).

Runs the REAL `cli.train` round-robin trainer (full-scale model, TPU) on
learnable synthetic on-disk datasets for all four tasks, with a mid-run
kill + `--resume-checkpoint latest` restart, then summarizes the per-task
metric curves (detection mAP, face top-1, pose PCK/AP) and asserts they
rose from the first epochs to the last.

Matches: reference round-robin loop + per-task eval
(/root/reference/training/round_robin_trainer.py:231-292,
training/lightning/pose_estimation/module.py:578-628).

Usage:
  python tools/run_convergence.py [--epochs 24] [--kill-after 900]
                                  [--out runs/r3_round_robin_convergence]
"""

from __future__ import annotations

import argparse
import csv
import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
# script-mode sys.path[0] is tools/, not the repo root — needed for the
# CheckpointManager import in resume_to_completion
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def train_cmd(args, data: pathlib.Path, out: pathlib.Path, resume: bool):
    cmd = [
        sys.executable, "-m", "prpe_tpu.cli.train",
        "--epochs", str(args.epochs),
        "--batch-size", str(args.batch_size),
        "--learning-rate", "1e-3",
        "--image-size", "640",
        "--person-data-dir", str(data / "person"),
        "--face-data-dir", str(data / "face"),
        "--face-rec-data-dir", str(data / "faces"),
        "--pose-data-dir", str(data / "pose"),
        "--max-train-samples", str(args.samples),
        "--max-val-samples", "64",
        "--checkpoint-dir", str(out / "ckpt"),
        "--log-dir", str(out),
        "--component-dir", "/tmp/none",  # fresh init (no ported ckpts here)
    ]
    if args.save_every != 1:
        # full-state checkpoints are ~2.1 GB; at per-epoch cadence the two
        # saves (epoch + best) dominate the task-epoch wall clock on this
        # relay host (~90s of ~150s measured round 4)
        cmd += ["--save-every", str(args.save_every)]
    if args.device_resident:
        # stage each task's epoch on-device once, before the first large
        # program executes — this environment's loopback relay collapses
        # host->device to ~35 MB/s after any large program runs (README
        # "Fed-from-disk"), which fed round 3's attempt at 3.1 img/s and
        # made 24 epochs x 4 tasks unfinishable
        cmd += ["--device-resident"]
    if resume:
        cmd += ["--resume-checkpoint", "latest"]
    return cmd


def summarize(out: pathlib.Path) -> dict:
    """first-3 vs last-3 epoch means for each task's headline metric."""
    heads = {
        "person_detection": ["val/mAP50", "val/mAP50-95"],
        "face_detection": ["val/mAP50", "val/mAP50-95"],
        "face_recognition": ["val/acc"],
        # NOT val/pck: the reference's PCK thresholds normalized-coordinate
        # distances against 0.2*sqrt(area) in pixels (units bug, reproduced
        # for parity — see train/steps.py pose metrics), so it saturates at
        # 1.0 for any prediction. val/pck_px is the corrected-units PCK;
        # COCO OKS AP is the strictest pose metric here.
        "pose_estimation": ["val/kpt_AP", "val/kpt_AP50", "val/pck_px"],
    }
    summary = {}
    for task, prefs in heads.items():
        path = out / f"{task}_history.csv"
        if not path.exists():
            summary[task] = {"error": f"missing {path.name}"}
            continue
        rows = list(csv.DictReader(path.open()))
        cols = list(rows[0].keys())

        def curve(col):
            return [float(r[col]) for r in rows if r.get(col) not in (None, "")]

        # preferred headline metric, skipping degenerate curves — constant
        # OR pure noise (total range under 0.01: an mAP wobbling between
        # 0 and 0.002 pre-convergence must not decide the verdict) — then
        # any non-degenerate val/ metric (val/loss is the final fallback
        # and is judged lower-is-better below)
        def meaningful(c):
            vals = curve(c)
            return len(vals) > 1 and (max(vals) - min(vals)) > 0.01

        col = next(
            (c for c in prefs + [c for c in cols if c.startswith("val/")]
             if c in cols and meaningful(c)),
            None,
        )
        if col is None:
            summary[task] = {"error": "no non-constant val metric"}
            continue
        vals = curve(col)
        head = sum(vals[:3]) / max(len(vals[:3]), 1)
        tail = sum(vals[-3:]) / max(len(vals[-3:]), 1)
        loss = curve("val/loss") if "val/loss" in cols else []
        # when the fallback lands on a loss-like column, lower is better
        up_is_good = "loss" not in col
        summary[task] = {
            "metric": col, "epochs": len(vals),
            "first3_mean": round(head, 4), "last3_mean": round(tail, 4),
            "improved": bool(tail > head if up_is_good else tail < head),
            "val_loss_first3": round(sum(loss[:3]) / 3, 4) if len(loss) >= 3 else None,
            "val_loss_last3": round(sum(loss[-3:]) / 3, 4) if len(loss) >= 3 else None,
            "curve": [round(v, 4) for v in vals],
        }
    return summary


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--data", default="/tmp/synth_mt_full")
    ap.add_argument("--out", default=str(ROOT / "runs" / "r4_round_robin_convergence"))
    ap.add_argument("--kill-after", type=int, default=900,
                    help="seconds before the mid-run SIGKILL (resume probe)")
    ap.add_argument("--no-device-resident", dest="device_resident",
                    action="store_false", default=True)
    ap.add_argument("--save-every", type=int, default=6)
    ap.add_argument("--resume-timeout", type=int, default=3600,
                    help="hard timeout per resume attempt (a wedged relay "
                         "blocks device_put forever; only a fresh process "
                         "recovers)")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--resume-only", action="store_true",
                    help="skip phase 1 (already ran); go straight to the "
                         "resume phase against the existing checkpoints")
    args = ap.parse_args()

    data = pathlib.Path(args.data)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if not args.summarize_only:
        if not (data / "pose" / "annotations").exists():
            subprocess.run(
                [sys.executable, str(ROOT / "tools" / "make_synthetic_multitask_data.py"),
                 str(data), str(args.samples), "64"], check=True)

        def resume_to_completion():
            # the SIGKILL can leave the single-client TPU relay mid-RPC;
            # resume is idempotent (restarts from the latest checkpoint),
            # so retry transient relay failures with a grace period. Each
            # attempt runs under a hard timeout: a wedged relay blocks
            # device_put in C++ on a futex FOREVER (observed round 4 — the
            # resume process sat at 4% CPU with staging half done), and only
            # a fresh process/connection recovers.
            t0 = time.time()
            for attempt in range(3):
                time.sleep(30)
                log = out / f"phase2_resume{'' if attempt == 0 else attempt}.log"
                # the kill can land before the first checkpoint ever hits
                # disk — restart from scratch in that case (resume=True
                # would FileNotFoundError forever). Decide exactly the way
                # restore() does (a bare glob also matches orbax *-tmp
                # staging dirs — the round-3 3x-crash failure mode).
                from prpe_tpu.train.checkpoint import CheckpointManager
                has_ckpt = CheckpointManager(str(out / "ckpt")).has_restorable()
                try:
                    r = subprocess.run(
                        train_cmd(args, data, out, resume=has_ckpt),
                        cwd=ROOT, stdout=log.open("w"),
                        stderr=subprocess.STDOUT,
                        timeout=args.resume_timeout)
                    rc = r.returncode
                except subprocess.TimeoutExpired:
                    rc = "timeout"
                if rc == 0:
                    print(f"[convergence] resume phase done in "
                          f"{time.time()-t0:.0f}s", flush=True)
                    return
                print(f"[convergence] resume attempt {attempt} failed "
                      f"(rc={rc}, see {log.name}); retrying",
                      flush=True)
            raise RuntimeError("resume phase failed 3 times")

        if args.resume_only:
            print("[convergence] --resume-only: continuing from latest",
                  flush=True)
            resume_to_completion()
        else:
            # phase 1: run until the kill (simulated crash mid-training)
            print(f"[convergence] phase 1: training, SIGKILL at "
                  f"{args.kill_after}s", flush=True)
            p = subprocess.Popen(train_cmd(args, data, out, resume=False),
                                 cwd=ROOT, stdout=(out / "phase1.log").open("w"),
                                 stderr=subprocess.STDOUT)
            try:
                p.wait(timeout=args.kill_after)
                print("[convergence] finished before the kill window",
                      flush=True)
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
                print("[convergence] killed mid-run; resuming from latest",
                      flush=True)
                resume_to_completion()

    summary = summarize(out)
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "curve"}
                      for k, v in summary.items()}, indent=2))
    ok = all(v.get("improved") for v in summary.values())
    print(f"[convergence] all tasks improved: {ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
