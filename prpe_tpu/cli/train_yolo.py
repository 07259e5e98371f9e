"""Standalone YOLOv11 trainer (the reference's parallel "yolopt" stack).

Feature parity with the reference trainer (training/yolopt/main.py:21-166):
  * YOLOv11-n..x at 640^2 directly on images (no backbone graft)
  * SGD + nesterov with bias/norm weight-decay exclusion, LinearLR warmup
  * EMA (decay 0.9999, tau 2000) evaluated for validation
  * gradient accumulation round(64 / batch)
  * mosaic/mixup/HSV train augmentation, mosaic disabled for the last 10
    epochs (reference: main.py:76-78)
  * per-epoch NMS + mAP eval, CSV history, best/last checkpoints
  * DDP -> data-axis mesh sharding: batches carry NamedSharding constraints;
    gradient/BN reduction is global under jit (SyncBN + allreduce parity)
"""

from __future__ import annotations

import argparse
import csv
import functools
import pathlib
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="dataset_folders/coco_person")
    ap.add_argument("--input-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--variant", default="n", choices=list("ntsmlx"))
    ap.add_argument("--num-classes", type=int, default=1)
    ap.add_argument("--max-lr", type=float, default=1e-2)
    ap.add_argument("--min-lr", type=float, default=1e-4)
    ap.add_argument("--warmup-epochs", type=float, default=3.0)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--max-train-samples", type=int, default=None)
    ap.add_argument("--max-val-samples", type=int, default=None)
    ap.add_argument("--output-dir", default="weights")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on synthetic data (smoke test)")
    ap.add_argument("--test", action="store_true",
                    help="eval-only: load --checkpoint (default "
                         "<output-dir>/best), run val mAP, save PR/F1/P/R "
                         "curve PNGs (reference: yolopt/main.py:169-239)")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir for --test (orbax StandardCheckpointer)")
    ap.add_argument("--class-names", default=None,
                    help="comma-separated class names for plot legends")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import orbax.checkpoint as ocp

    from prpe_tpu.core.config import DetectionConfig, OptimConfig
    from prpe_tpu.data import pipeline, synthetic
    from prpe_tpu.data.detection import YoloMosaicDataset, YoloTxtDataset
    from prpe_tpu.data.packed import apply_image_norm
    from prpe_tpu.eval.map import detection_eval_hook
    from prpe_tpu.nn.yolo import YOLO, decode_predictions
    from prpe_tpu.ops import losses as L
    from prpe_tpu.ops import nms as nms_ops
    from prpe_tpu.train.optim import build_optimizer
    from prpe_tpu.train.state import update_ema
    from prpe_tpu.utils.profiling import count_flops, count_params

    det_cfg = DetectionConfig(num_classes=args.num_classes, variant=args.variant,
                              image_size=args.input_size)
    model = YOLO(nc=args.num_classes, variant=args.variant)
    x0 = jnp.zeros((1, args.input_size, args.input_size, 3))
    # jit: one compiled init program instead of per-primitive eager dispatch
    variables = jax.jit(model.init)(jax.random.key(0), x0)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    # startup profile line (reference: yolopt/main.py:242-256 thop profile())
    cost = count_flops(
        lambda v, x: model.apply(v, x, False),
        {"params": params, "batch_stats": batch_stats}, x0)
    print(f"params: {count_params(params) / 1e6:.2f}M  "
          f"flops/img: {cost['flops'] / 1e9:.2f}G")

    # ---- data ------------------------------------------------------------ #
    accumulate = max(1, round(64 / args.batch_size))
    if args.synthetic:
        train_loader = synthetic.make_loader(
            "person_detection", batches_per_epoch=8, batch_size=args.batch_size,
            image_size=args.input_size, max_gt=det_cfg.max_gt)
        val_loader = synthetic.make_loader(
            "person_detection", batches_per_epoch=2, seed=9,
            batch_size=args.batch_size, image_size=args.input_size,
            max_gt=det_cfg.max_gt)
        steps_per_epoch = 8
    else:
        base = YoloTxtDataset(args.data_dir, "train", args.input_size, det_cfg.max_gt)
        train_ds = YoloMosaicDataset(base)
        val_ds = YoloTxtDataset(args.data_dir, "val", args.input_size, det_cfg.max_gt)
        train_loader = pipeline.make_epoch_loader(
            train_ds, args.batch_size, max_samples=args.max_train_samples)
        val_loader = pipeline.make_epoch_loader(
            val_ds, args.batch_size, max_samples=args.max_val_samples, shuffle=False)
        n = args.max_train_samples or len(train_ds)
        steps_per_epoch = max(1, n // args.batch_size)
        # mosaic off for the last 10 epochs
        mosaic_off_epoch = max(0, args.epochs - 10)

    ocfg = OptimConfig(
        optimizer="sgd", learning_rate=args.max_lr, weight_decay=args.weight_decay,
        schedule="linear", min_lr=args.min_lr,
        warmup_steps=int(max(args.warmup_epochs * steps_per_epoch, 100)),
        total_steps=args.epochs * steps_per_epoch, accumulate=accumulate,
    )
    tx = build_optimizer(ocfg, params)
    opt_state = tx.init(params)
    ema_params = jax.tree_util.tree_map(jnp.copy, params)

    # ---- jitted steps ---------------------------------------------------- #
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def train_step(params, batch_stats, opt_state, ema_params, updates_count, batch):
        # loaders ship raw uint8; /255 fuses into the first conv on-device
        image = apply_image_norm(batch["image"], "unit")

        def loss_fn(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, image, True,
                mutable=["batch_stats"],
            )
            dl = L.yolo_detection_loss(
                outs, batch["gt_labels"], batch["gt_boxes"], batch["gt_mask"],
                num_classes=args.num_classes,
                box_gain=det_cfg.box_gain, cls_gain=det_cfg.cls_gain,
                dfl_gain=det_cfg.dfl_gain,
            )
            return dl.total, (mut["batch_stats"], dl)

        (loss, (new_stats, dl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        updates_count = updates_count + 1
        ema_params = update_ema(ema_params, params, updates_count)
        metrics = {"loss": dl.total, "box": dl.box, "cls": dl.cls, "dfl": dl.dfl}
        return params, new_stats, opt_state, ema_params, updates_count, metrics

    @jax.jit
    def eval_step(eval_params, batch_stats, batch):
        outs = model.apply(
            {"params": eval_params, "batch_stats": batch_stats},
            apply_image_norm(batch["image"], "unit"), False,
        )
        decoded = decode_predictions(outs, args.num_classes)
        return nms_ops.non_max_suppression(
            decoded, conf_threshold=det_cfg.conf_threshold,
            iou_threshold=det_cfg.iou_threshold, max_det=det_cfg.max_det,
            pre_nms_top_k=det_cfg.pre_nms_top_k,
        )

    # ---- loop ------------------------------------------------------------ #
    out_dir = pathlib.Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    csv_path = out_dir / "step.csv"
    ckpt = ocp.StandardCheckpointer()
    hook = detection_eval_hook(args.input_size)

    if args.test:
        # Eval-only entry (reference: yolopt/main.py:169-239 `test()`:
        # loads best.pt, fuses conv+BN, evaluates, plots curves). Here BN
        # folding happens at trace time (nn/common.py::inference_bn) and the
        # curve PNGs come from eval/plots.py.
        from prpe_tpu.eval.map import collect_per_image, evaluate_detections
        from prpe_tpu.eval.plots import save_detection_curves

        ckpt_dir = pathlib.Path(args.checkpoint or (out_dir / "best"))
        template = {"params": jax.device_get(params),
                    "batch_stats": jax.device_get(batch_stats)}
        restored = ckpt.restore(ckpt_dir.absolute(), template)
        eval_params, eval_stats = restored["params"], restored["batch_stats"]

        outputs = []
        for batch in val_loader(0):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            det = eval_step(eval_params, eval_stats, batch)
            outputs.append((jax.device_get(det), batch))
        per_image = collect_per_image(outputs, args.input_size)
        metrics, curves = evaluate_detections(per_image, return_curves=True)
        names = args.class_names.split(",") if args.class_names else None
        paths = save_detection_curves(curves, out_dir, names)
        print(("%10s" * 5) % ("", "precision", "recall", "mAP50", "mAP"))
        print(("%10s" + "%10.3g" * 4) % (
            "", metrics["precision"], metrics["recall"], metrics["mAP50"],
            metrics["mAP50-95"]))
        for k, v in paths.items():
            print(f"{k}: {v}")
        return 0
    best_map = -1.0
    updates_count = jnp.zeros((), jnp.int32)

    for epoch in range(args.epochs):
        if not args.synthetic and epoch >= mosaic_off_epoch:
            train_ds.set_mosaic(0.0)
        sums, nb = {}, 0
        for batch in train_loader(epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, batch_stats, opt_state, ema_params, updates_count, m = train_step(
                params, batch_stats, opt_state, ema_params, updates_count, batch)
            nb += 1
            for k, v in jax.device_get(m).items():
                sums[k] = sums.get(k, 0.0) + float(v)
        train_means = {k: v / max(nb, 1) for k, v in sums.items()}

        outputs = []
        for batch in val_loader(epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            det = eval_step(ema_params, batch_stats, batch)
            outputs.append((jax.device_get(det), batch))
        val = hook(outputs) if outputs else {}

        row = {"epoch": epoch, **train_means, **val}
        exists = csv_path.exists()
        with csv_path.open("a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if not exists:
                w.writeheader()
            w.writerow({k: (f"{v:.5f}" if isinstance(v, float) else v)
                        for k, v in row.items()})
        print(row)

        save = {"params": jax.device_get(ema_params),
                "batch_stats": jax.device_get(batch_stats)}
        ckpt.save((out_dir / "last").absolute(), save, force=True)
        if val.get("mAP50-95", 0.0) > best_map:
            best_map = val.get("mAP50-95", 0.0)
            ckpt.save((out_dir / "best").absolute(), save, force=True)
        # newer orbax saves asynchronously; block so interpreter shutdown
        # can't kill the committing thread (same fix as train/checkpoint.py)
        wait = getattr(ckpt, "wait_until_finished", None)
        if wait is not None:
            wait()
    return 0


if __name__ == "__main__":
    sys.exit(main())
