"""Generate learnable on-disk datasets for ALL FOUR round-robin tasks.

Extends tools/make_synthetic_yolo_dataset.py to the full `cli.train` surface
(reference trainer consumes the same four layouts —
training/round_robin_trainer.py:444-534):

  person/  face/   YOLO-txt dirs (images/{split} + labels/{split})
  faces/imgs/<id>/ identity folders (MS1MV2 unpack layout,
                   face_recognition/datamodule.py:34-60)
  pose/            images/{split} + annotations/person_keypoints_{split}2017.json
                   (pose_estimation/datamodule.py:83-84 layout)

The data is synthetic but LEARNABLE, so metrics must rise over epochs:
  * detection: bright rectangles on dark noise (mAP -> high)
  * faces: per-identity color/block signature + jitter (top-1 -> ~1.0)
  * pose: 17 distinct-colored dots in a skeleton layout on a person box
    (PCK / keypoint AP -> high)

Usage: python tools/make_synthetic_multitask_data.py OUT_ROOT [n_train] [n_val]
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np
from PIL import Image

from make_synthetic_yolo_dataset import make_split as make_det_split  # noqa: E402

# 17 maximally-distinct keypoint colors (hue wheel), fixed across the dataset
_KP_COLORS = np.stack([
    np.array([np.cos(t), np.cos(t - 2.094), np.cos(t + 2.094)]) * 0.5 + 0.5
    for t in np.linspace(0, 2 * np.pi, 17, endpoint=False)
])

# rough upright-skeleton template in a unit box (x, y in [0,1])
_SKELETON = np.array([
    [0.50, 0.10], [0.46, 0.08], [0.54, 0.08], [0.40, 0.10], [0.60, 0.10],
    [0.35, 0.25], [0.65, 0.25], [0.28, 0.42], [0.72, 0.42], [0.22, 0.58],
    [0.78, 0.58], [0.42, 0.55], [0.58, 0.55], [0.40, 0.75], [0.60, 0.75],
    [0.38, 0.95], [0.62, 0.95],
])


def make_faces(root: pathlib.Path, n_ids: int, per_id: int, size: int = 112,
               seed: int = 0):
    rng = np.random.default_rng(seed)
    sigs = rng.random((n_ids, 4, 4, 3))  # per-identity block signature
    for c in range(n_ids):
        d = root / "imgs" / f"id{c:04d}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per_id):
            base = np.kron(sigs[c], np.ones((size // 4, size // 4, 1)))
            img = base + rng.normal(0, 0.08, base.shape)
            # small brightness/shift jitter so the task isn't trivial memcmp
            img = np.roll(img, rng.integers(-6, 7, 2), axis=(0, 1))
            img = np.clip(img * rng.uniform(0.8, 1.2), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                d / f"{i:03d}.jpg", quality=92)
    print(f"faces: {n_ids} identities x {per_id} in {root / 'imgs'}")


def make_pose_split(root: pathlib.Path, split: str, n: int, size: int,
                    seed: int):
    img_dir = root / "images" / split
    ann_dir = root / "annotations"
    img_dir.mkdir(parents=True, exist_ok=True)
    ann_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    images, anns = [], []
    ann_id = 1
    for i in range(n):
        img = rng.uniform(0, 0.25, (size, size, 3))
        # exactly ONE person per pose image: the combined model's pose branch
        # (like the reference's CustomVitPose fed the whole frame,
        # modify_models.py:330-380) predicts a single 17-kpt skeleton per
        # image, so multi-person scenes cap keypoint-AP recall at
        # 1/persons-per-image no matter how well the model trains
        n_person = 1
        for _ in range(n_person):
            bw = rng.uniform(0.25, 0.45) * size
            bh = rng.uniform(0.45, 0.7) * size
            x0 = rng.uniform(0, size - bw)
            y0 = rng.uniform(0, size - bh)
            img[int(y0):int(y0 + bh), int(x0):int(x0 + bw)] *= 0.5
            img[int(y0):int(y0 + bh), int(x0):int(x0 + bw)] += 0.35
            kps = []
            pts = _SKELETON + rng.normal(0, 0.02, _SKELETON.shape)
            for k in range(17):
                kx = x0 + pts[k, 0] * bw
                ky = y0 + pts[k, 1] * bh
                r = max(int(0.012 * size), 2)
                ys, xs = np.ogrid[-r:r + 1, -r:r + 1]
                disc = ys * ys + xs * xs <= r * r
                yy, xx = int(ky), int(kx)
                y1, y2 = max(yy - r, 0), min(yy + r + 1, size)
                x1, x2 = max(xx - r, 0), min(xx + r + 1, size)
                img[y1:y2, x1:x2][disc[: y2 - y1, : x2 - x1]] = _KP_COLORS[k]
                kps += [float(kx), float(ky), 2]
            anns.append({
                "id": ann_id, "image_id": i, "category_id": 1,
                "keypoints": kps, "num_keypoints": 17, "iscrowd": 0,
                "bbox": [x0, y0, bw, bh], "area": float(bw * bh),
            })
            ann_id += 1
        name = f"{i:06d}.jpg"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            img_dir / name, quality=92)
        images.append({"id": i, "file_name": name, "width": size, "height": size})
    coco = {
        "images": images,
        "annotations": anns,
        "categories": [{
            "id": 1, "name": "person",
            "keypoints": [f"k{j}" for j in range(17)], "skeleton": [],
        }],
    }
    (ann_dir / f"person_keypoints_{split}2017.json").write_text(json.dumps(coco))
    print(f"pose {split}: {n} images in {img_dir}")


def main():
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_multitask")
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_val = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    make_det_split(out / "person", "train", n_train, 320, seed=0)
    make_det_split(out / "person", "val", n_val, 320, seed=1)
    make_det_split(out / "face", "train", n_train, 320, seed=2)
    make_det_split(out / "face", "val", n_val, 320, seed=3)
    make_faces(out / "faces", n_ids=32, per_id=max(n_train // 8, 10))
    make_pose_split(out / "pose", "train", n_train, 640, seed=4)
    make_pose_split(out / "pose", "val", n_val, 640, seed=5)


if __name__ == "__main__":
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    main()
