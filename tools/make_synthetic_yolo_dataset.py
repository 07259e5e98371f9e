"""Generate an on-disk YOLO-txt detection dataset (synthetic rectangles).

Produces the reference's expected layout (images/{train,val}/*.png +
labels/{train,val}/*.txt with normalized `cls cx cy w h` rows — reference:
training/lightning/object_detection/datamodule.py:38-117) so the standalone
trainer and the mosaic/affine/visual augmentation pipeline can be exercised
end-to-end through real file IO when the real COCO/WIDER downloads are
unavailable (zero-egress environment).

Usage: python tools/make_synthetic_yolo_dataset.py OUT_DIR [n_train] [n_val] [size]
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
from PIL import Image


def make_split(root: pathlib.Path, split: str, n: int, size: int, seed: int):
    img_dir = root / "images" / split
    lab_dir = root / "labels" / split
    img_dir.mkdir(parents=True, exist_ok=True)
    lab_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img = rng.uniform(0, 0.3, size=(size, size, 3))
        rows = []
        for _ in range(int(rng.integers(1, 5))):
            w = rng.uniform(0.15, 0.4)
            h = rng.uniform(0.15, 0.4)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            color = rng.uniform(0.7, 1.0, size=3)
            x1, y1 = int((cx - w / 2) * size), int((cy - h / 2) * size)
            x2, y2 = int((cx + w / 2) * size), int((cy + h / 2) * size)
            img[y1:y2, x1:x2] = color
            rows.append(f"0 {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        Image.fromarray((img * 255).astype(np.uint8)).save(img_dir / f"{i:05d}.png")
        (lab_dir / f"{i:05d}.txt").write_text("\n".join(rows) + "\n")
    print(f"{split}: {n} images in {img_dir}")


def main():
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_yolo")
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_val = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 320
    make_split(out, "train", n_train, size, seed=0)
    make_split(out, "val", n_val, size, seed=1)


if __name__ == "__main__":
    main()
