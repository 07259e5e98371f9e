"""Smoke tests for the user-facing CLI mains (VERDICT r2 item 6):
``infer`` (the thesis pipeline), ``eval_verification``, and ``train``
(argument wiring + checkpoint + resume through main()).

All use the tiny presets so compiles stay in the suite's CPU cache budget.
"""

import io
import json

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # model compiles, minutes on CPU


def _write_png(path, size=128, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((size, size, 3)) * 60).astype(np.uint8)
    img[30:100, 40:90] = [220, 180, 160]  # a bright person-ish block
    Image.fromarray(img).save(path)
    return path


def test_infer_main_smoke(tmp_path, capsys):
    from prpe_tpu.cli.infer import main

    imgs = [str(_write_png(tmp_path / f"scene{i}.png", seed=i)) for i in range(2)]
    enroll = str(_write_png(tmp_path / "face.png", size=112, seed=9))
    out = tmp_path / "results.json"
    rc = main(imgs + ["--enroll", enroll, "--preset", "tiny",
                      "--image-size", "128", "--output", str(out)])
    assert rc == 0
    results = json.loads(out.read_text())
    assert len(results) == 2
    for r in results:
        assert set(r) == {"image", "persons", "faces", "poses"}
        for p in r["persons"]:
            assert set(p) == {"box", "score", "gated"}
        for pose in r["poses"]:
            assert len(pose["keypoints"]) == 17


def test_eval_verification_main_smoke(tmp_path, capsys):
    from prpe_tpu.cli.eval_verification import main

    rng = np.random.default_rng(0)
    jpegs = []
    for i in range(8):  # 4 pairs
        img = (rng.random((112, 112, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG")
        jpegs.append(buf.getvalue())
    issame = np.array([True, False, True, False])
    pairs = tmp_path / "pairs.npz"
    np.savez(pairs, jpegs=np.array(jpegs, dtype=object), issame=issame)

    rc = main([str(pairs), "--arch", "ir_18", "--batch-size", "4"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "accuracy" in metrics
    assert 0.0 <= metrics["accuracy"] <= 1.0


def test_train_main_smoke_and_resume(tmp_path):
    """cli.train main(): tiny preset, synthetic fallback loaders, 1 epoch
    through all four tasks -> checkpoint; then a resume run continues to
    epoch 2 (reference: round_robin_trainer.py resume semantics)."""
    from prpe_tpu.cli.train import main

    ckpt = tmp_path / "ckpt"
    logs = tmp_path / "runs"
    base = ["--preset", "tiny", "--batch-size", "4", "--image-size", "64",
            "--max-train-samples", "8", "--max-val-samples", "4",
            "--checkpoint-dir", str(ckpt), "--log-dir", str(logs),
            "--component-dir", str(tmp_path / "none")]
    rc = main(["--epochs", "1"] + base)
    assert rc == 0
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["checkpoints"], "no checkpoints written"
    assert (logs / "training_metrics.log").exists()

    # resume leg also exercises --device-resident (stage-once-replay
    # loaders, data/pipeline.py::device_resident_loader) on the same
    # compiled programs
    rc = main(["--epochs", "2", "--resume-checkpoint", "latest",
               "--device-resident"] + base)
    assert rc == 0
    meta2 = json.loads((ckpt / "meta.json").read_text())
    epochs = {c["epoch"] for c in meta2["checkpoints"]}
    assert 1 in epochs, f"resume did not reach epoch 1: {sorted(epochs)}"
