"""Fed-from-disk throughput benchmark (VERDICT r2 item 1/2).

Measures the cascade and train paths with batches flowing
disk -> host pipeline -> device_put -> jitted program, instead of the
device-resident tensors bench.py/bench_train.py use. Modes:

  cascade  packed uint8 640^2 scenes -> PackedDataset.batches ->
           prefetch_to_device -> the full face-gated pose cascade
  train    packed detection dataset -> the real detection train step
  jpeg     on-disk JPEGs -> MultiprocessLoader decode workers (the
           reference-parity path, DataLoader(num_workers=N) equivalent) —
           reports the host pipeline's own rate, which on this 1-core host
           is decode-bound; the packed path is the production design
           (see prpe_tpu/data/packed.py docstring)

Each mode prints one JSON line. Disk data is synthesized on first run under
--data-dir (default /tmp/prpe_bench_io) and reused after.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np


def _make_scene(rng: np.random.Generator, size: int) -> np.ndarray:
    """Synthetic uint8 scene with person/face-like rectangles so detection,
    gating and pose all do real work (same recipe as data/synthetic.py)."""
    img = (rng.random((size, size, 3)) * 60).astype(np.uint8)
    for _ in range(rng.integers(1, 4)):
        x, y = rng.integers(0, size - 200, 2)
        w, h = rng.integers(80, 200), rng.integers(160, 320)
        h = min(h, size - y - 1)
        w = min(w, size - x - 1)
        img[y : y + h, x : x + w] = rng.integers(120, 255, 3, np.uint8)
        fh = max(h // 4, 16)
        img[y : y + fh, x : x + w] = rng.integers(180, 255, 3, np.uint8)
    return img


def _ensure_packed_scenes(root: pathlib.Path, n: int, size: int) -> pathlib.Path:
    out = root / f"scenes_{n}_{size}"
    if (out / "meta.json").exists():
        return out

    class SceneDS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            rng = np.random.default_rng(1000 + i)
            return {"image": _make_scene(rng, size).astype(np.float32) / 255.0}

    from prpe_tpu.data.packed import pack_dataset

    print(f"[bench_io] packing {n} synthetic scenes to {out} ...",
          file=sys.stderr, flush=True)
    pack_dataset(SceneDS(), out, image_norm="unit", progress_every=256)
    return out


def _ensure_jpeg_dataset(root: pathlib.Path, n: int, size: int) -> pathlib.Path:
    out = root / f"jpeg_{n}_{size}"
    img_dir = out / "images" / "train"
    lbl_dir = out / "labels" / "train"
    if img_dir.exists() and len(list(img_dir.glob("*.jpg"))) >= n:
        return out
    from PIL import Image

    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    print(f"[bench_io] writing {n} JPEGs to {img_dir} ...",
          file=sys.stderr, flush=True)
    for i in range(n):
        rng = np.random.default_rng(2000 + i)
        Image.fromarray(_make_scene(rng, size)).save(
            img_dir / f"{i:06d}.jpg", quality=90
        )
        (lbl_dir / f"{i:06d}.txt").write_text("0 0.5 0.5 0.3 0.5\n")
    return out


def bench_cascade(args) -> dict:
    import jax
    import jax.numpy as jnp

    from prpe_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from prpe_tpu.core.config import CascadeConfig, DetectionConfig, PoseConfig
    from prpe_tpu.data.packed import PackedDataset
    from prpe_tpu.data.pipeline import prefetch_to_device
    from prpe_tpu.infer.cascade import CascadeModel, build_cascade_runner

    data = _ensure_packed_scenes(pathlib.Path(args.data_dir), args.images, 640)
    ds = PackedDataset(data)

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = CascadeModel(detection=DetectionConfig(), pose_cfg=PoseConfig(),
                         dtype=dtype)
    variables = jax.jit(
        lambda k, a, b, c: model.init(k, a, b, c, method="init_all")
    )(jax.random.key(0), jnp.zeros((1, 640, 640, 3), jnp.float32),
      jnp.zeros((1, 112, 112, 3), jnp.float32),
      jnp.zeros((1, 256, 192, 3), jnp.float32))
    runner = build_cascade_runner(
        model, CascadeConfig(max_persons=8, max_faces=8, match_threshold=0.3),
        pose_capacity=args.batch,
    )
    gallery = jax.random.normal(jax.random.key(2), (32, 512))
    gallery = gallery / jnp.linalg.norm(gallery, axis=-1, keepdims=True)

    idx = np.arange(len(ds))

    # ---- leg rates, measured in the order the axon relay allows:
    # host->device bandwidth collapses ~40x after the first large-program
    # execution on the loopback relay (README "Fed-from-disk" section;
    # /tmp experiments r3), so the put rate must be taken BEFORE the
    # compile-warmup execution to reflect the pipeline itself.
    warm = next(iter(ds.batches(idx, args.batch)))
    img = warm["image"].copy()
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(jax.device_put(img))
    put_mb_s = 3 * img.nbytes / (time.perf_counter() - t0) / 1e6

    t0 = time.perf_counter()
    n = 0
    for _ in ds.batches(idx, args.batch):
        n += args.batch
    gather_img_s = n / (time.perf_counter() - t0)

    # compile warmup on one disk batch (uint8 pixels end-to-end)
    xwarm = jax.device_put(img)
    out = runner(variables, xwarm, gallery)
    jax.block_until_ready(out)

    # device-resident execution rate (same program, no host in the loop)
    t0 = time.perf_counter()
    for _ in range(4):
        out = runner(variables, xwarm, gallery)
    jax.block_until_ready(out)
    exec_img_s = 4 * args.batch / (time.perf_counter() - t0)

    def epoch_stream():
        return prefetch_to_device(
            ({"image": b["image"]} for b in ds.batches(idx, args.batch)),
            size=args.prefetch,
        )

    # timed epochs over the whole on-disk set
    n_img = 0
    t0 = time.perf_counter()
    last = None
    for _ in range(args.epochs):
        for batch in epoch_stream():
            last = runner(variables, batch["image"], gallery)
            n_img += args.batch
    jax.block_until_ready(last)
    dt = time.perf_counter() - t0
    return {
        "metric": "cascade_640_from_disk",
        "value": round(n_img / dt, 2),
        "unit": "images/sec",
        "legs": {
            "host_gather_img_s": round(gather_img_s, 1),
            "device_put_pre_exec_mb_s": round(put_mb_s, 1),
            "device_exec_img_s": round(exec_img_s, 1),
        },
        "images_on_disk": len(ds),
        "batch": args.batch,
    }


def bench_train(args) -> dict:
    import jax
    import jax.numpy as jnp

    from prpe_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from prpe_tpu.core.config import CombinedModelConfig, OptimConfig
    from prpe_tpu.data.packed import PackedDataset, pack_dataset
    from prpe_tpu.data.pipeline import prefetch_to_device
    from prpe_tpu.data.synthetic import detection_batch
    from prpe_tpu.models.combined import CombinedModel
    from prpe_tpu.train.optim import build_optimizer
    from prpe_tpu.train.state import create_train_state
    from prpe_tpu.train.steps import make_train_step, mask_optimizer

    root = pathlib.Path(args.data_dir) / f"det_{args.images}_640"
    if not (root / "meta.json").exists():
        class DetDS:
            def __len__(self):
                return args.images

            def __getitem__(self, i):
                rng = np.random.default_rng(3000 + i)
                b = detection_batch(rng, 1, 640, 16)
                return {k: v[0] for k, v in b.items()}

        print(f"[bench_io] packing {args.images} detection samples ...", file=sys.stderr,
              flush=True)
        pack_dataset(DetDS(), root, image_norm="unit", progress_every=256)
    ds = PackedDataset(root)

    cfg = CombinedModelConfig()
    model = CombinedModel(config=cfg)
    variables = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, 640, 640, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32), method="init_all")
    )(jax.random.key(0))
    task = "person_detection"
    tx = mask_optimizer(build_optimizer(OptimConfig(learning_rate=1e-3)), task)
    state = jax.jit(lambda v: create_train_state(v, {task: tx}))(variables)
    step = make_train_step(model, task, tx, cfg)

    idx = np.arange(len(ds))
    warm = next(iter(ds.batches(idx, args.batch)))
    # put bandwidth before the first large-program execution (see
    # bench_cascade: the relay's h2 link degrades after it)
    blob = warm["image"].copy()
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(jax.device_put(blob))
    put_mb_s = 3 * blob.nbytes / (time.perf_counter() - t0) / 1e6
    state, metrics = step(state, jax.device_put(warm), jax.random.key(0))
    jax.block_until_ready(metrics)

    n_img = 0
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        for batch in prefetch_to_device(ds.batches(idx, args.batch),
                                        size=args.prefetch):
            state, metrics = step(state, batch, jax.random.key(1))
            n_img += args.batch
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    return {
        "metric": "detection_train_from_disk",
        "value": round(n_img / dt, 2),
        "unit": "images/sec",
        "legs": {"device_put_pre_exec_mb_s": round(put_mb_s, 1)},
        "images_on_disk": len(ds),
        "batch": args.batch,
    }


def bench_jpeg(args) -> dict:
    """Host-pipeline-only rate for the reference-parity JPEG decode path
    with N pre-forked workers (no device in the loop — on this 1-core host
    the decode is the bottleneck by construction; see module docstring)."""
    from prpe_tpu.data.detection import YoloTxtDataset
    from prpe_tpu.data.loader import MultiprocessLoader
    from prpe_tpu.data.pipeline import default_collate

    root = _ensure_jpeg_dataset(pathlib.Path(args.data_dir),
                                min(args.images, 512), 640)
    ds = YoloTxtDataset(str(root), "train", image_size=640, augment=True)
    idx = np.arange(len(ds))
    with MultiprocessLoader(ds, getattr(ds, "collate", default_collate),
                            args.batch, num_workers=args.workers) as pool:
        # warm epoch (page cache, label cache)
        for _ in pool.run(idx):
            pass
        n = 0
        t0 = time.perf_counter()
        for b in pool.run(idx):
            n += b["image"].shape[0]
        dt = time.perf_counter() - t0
    return {
        "metric": "jpeg_decode_pipeline_640",
        "value": round(n / dt, 2),
        "unit": "images/sec",
        "workers": args.workers,
        "host_cores": 1,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["cascade", "train", "jpeg"],
                    default="cascade")
    ap.add_argument("--data-dir", default="/tmp/prpe_bench_io")
    ap.add_argument("--images", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--prefetch", type=int, default=2)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()
    if args.mode == "train" and args.batch == 128:
        args.batch = 32  # reference training batch
    result = {"cascade": bench_cascade, "train": bench_train,
              "jpeg": bench_jpeg}[args.mode](args)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
