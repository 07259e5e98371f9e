"""Round-robin multi-task training CLI.

Mirror of the reference entry point + flags
(reference: training/round_robin_trainer.py:395-431): epochs, batch size, lr,
per-task data dirs, pose sigma/threshold, resume. Tasks whose datasets are
missing fall back to the synthetic loaders so the full loop is always
runnable (the reference hard-fails without multi-GB downloads).
"""

from __future__ import annotations

import argparse
import pathlib
import sys


def build_task_loaders(args, cfg):
    from prpe_tpu.data import pipeline, synthetic
    from prpe_tpu.data.detection import YoloTxtDataset
    from prpe_tpu.data.faces import IdentityFolderDataset
    from prpe_tpu.data.pose import CocoKeypointDataset
    from prpe_tpu.eval.map import detection_eval_hook

    loaders = {}

    def detection(task, root):
        try:
            train = YoloTxtDataset(root, "train", args.image_size, cfg.detection.max_gt, augment=True)
            val = YoloTxtDataset(root, "val", args.image_size, cfg.detection.max_gt)
            return {
                "train": pipeline.make_epoch_loader(
                    train, args.batch_size, max_samples=args.max_train_samples,
                    num_workers=args.num_workers),
                "val": pipeline.make_epoch_loader(
                    val, args.batch_size, max_samples=args.max_val_samples, shuffle=False),
                "eval_hook": detection_eval_hook(args.image_size),
            }
        except FileNotFoundError:
            print(f"[{task}] dataset not found at {root}; using synthetic data")
            return {
                "train": synthetic.make_loader(task, batches_per_epoch=8,
                                               batch_size=args.batch_size,
                                               image_size=args.image_size,
                                               max_gt=cfg.detection.max_gt),
                "val": synthetic.make_loader(task, batches_per_epoch=2, seed=9,
                                             batch_size=args.batch_size,
                                             image_size=args.image_size,
                                             max_gt=cfg.detection.max_gt),
                "eval_hook": detection_eval_hook(args.image_size),
            }

    loaders["person_detection"] = detection("person_detection", args.person_data_dir)
    loaders["face_detection"] = detection("face_detection", args.face_data_dir)

    from prpe_tpu.eval.verification import face_verification_hook

    try:
        ftrain = IdentityFolderDataset(args.face_rec_data_dir, "train", augment=True)
        fval = IdentityFolderDataset(args.face_rec_data_dir, "val")
        loaders["face_recognition"] = {
            "train": pipeline.make_epoch_loader(ftrain, args.batch_size,
                                                max_samples=args.max_train_samples,
                                                num_workers=args.num_workers),
            "val": pipeline.make_epoch_loader(fval, args.batch_size,
                                              max_samples=args.max_val_samples,
                                              shuffle=False),
            "eval_hook": face_verification_hook(),
        }
    except (FileNotFoundError, StopIteration, OSError):
        print(f"[face_recognition] dataset not found at {args.face_rec_data_dir}; synthetic")
        loaders["face_recognition"] = {
            "train": synthetic.make_loader("face_recognition", batches_per_epoch=8,
                                           batch_size=args.batch_size,
                                           image_size=args.image_size,
                                           num_classes=cfg.face.num_classes),
            "val": synthetic.make_loader("face_recognition", batches_per_epoch=2, seed=9,
                                         batch_size=args.batch_size,
                                         image_size=args.image_size,
                                         num_classes=cfg.face.num_classes),
        }

    try:
        ptrain = CocoKeypointDataset(args.pose_data_dir, "train",
                                     image_size=args.image_size,
                                     max_instances=cfg.pose.max_instances,
                                     augment=True)
        pval = CocoKeypointDataset(args.pose_data_dir, "val",
                                   image_size=args.image_size,
                                   max_instances=cfg.pose.max_instances)
        from prpe_tpu.eval.pose_hook import pose_eval_hook

        loaders["pose_estimation"] = {
            "train": pipeline.make_epoch_loader(ptrain, args.batch_size,
                                                max_samples=args.max_train_samples,
                                                num_workers=args.num_workers),
            "val": pipeline.make_epoch_loader(pval, args.batch_size,
                                              max_samples=args.max_val_samples,
                                              shuffle=False),
            "eval_hook": pose_eval_hook(args.image_size, args.keypoint_thresh),
        }
    except (FileNotFoundError, OSError):
        print(f"[pose_estimation] dataset not found at {args.pose_data_dir}; synthetic")
        loaders["pose_estimation"] = {
            "train": synthetic.make_loader("pose_estimation", batches_per_epoch=8,
                                           batch_size=args.batch_size,
                                           image_size=args.image_size,
                                           max_instances=cfg.pose.max_instances),
        }
    return loaders


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--learning-rate", type=float, default=1e-3)
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--person-data-dir", default="dataset_folders/coco_person")
    ap.add_argument("--face-data-dir", default="dataset_folders/yolo_face")
    ap.add_argument("--face-rec-data-dir", default="dataset_folders/ms1mv2")
    ap.add_argument("--pose-data-dir", default="dataset_folders/coco")
    ap.add_argument("--max-train-samples", type=int, default=2500)
    ap.add_argument("--max-val-samples", type=int, default=400)
    ap.add_argument("--pose-sigma", type=float, default=2.0)
    ap.add_argument("--keypoint-thresh", type=float, default=0.3)
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument("--save-every", type=int, default=1,
                    help="save the combined checkpoint every N epochs "
                         "(reference base_config save_period, "
                         "round_robin_trainer.py:439). Full-state "
                         "checkpoints are ~2 GB; on slow-relay hosts "
                         "per-epoch saving dominates the epoch wall clock")
    ap.add_argument("--resume-checkpoint", default=None)
    ap.add_argument("--component-dir", default="component_models")
    ap.add_argument("--log-dir", default="runs")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tasks", default=None,
                    help="comma-separated subset of tasks to round-robin "
                         "(default: all four). E.g. --tasks face_recognition "
                         "for a focused single-task run")
    ap.add_argument("--num-workers", type=int, default=0,
                    help="decode/augment worker processes per TRAIN loader "
                         "(reference: DataLoader num_workers=4-8; 0 = inline "
                         "on the prefetch thread — right default for few-core "
                         "TPU hosts feeding packed data)")
    ap.add_argument("--device-resident", action="store_true",
                    help="stage every task's epoch on device ONCE before the "
                         "first program runs and replay it each epoch "
                         "(augmentation frozen to the staged epoch). For "
                         "datasets that fit HBM — e.g. convergence runs — on "
                         "hosts with a slow/degrading host->device link "
                         "(data/pipeline.py::device_resident_loader)")
    ap.add_argument("--device-resident-refresh", action="store_true",
                    help="with --device-resident: double-buffer FRESH "
                         "per-epoch augmentations (reference regimen, "
                         "yolopt/dataset.py:105-176) — host pipeline runs "
                         "epoch N+1 in a background thread during epoch N, "
                         "transfers interleave between program executions, "
                         "frozen-replay fallback when staging lags. Needs "
                         "2x the train-split HBM budget")
    ap.add_argument("--device-resident-max-gb", type=float, default=8.0,
                    help="refuse --device-resident beyond this total staged "
                         "size (model + optimizer states need the rest of "
                         "a 16 GB v5e HBM)")
    # mixed precision: bf16 compute / fp32 params is the TPU analogue of the
    # reference's Lightning precision=16 (round_robin_trainer.py:201)
    ap.add_argument("--dtype", choices=("bfloat16", "float32"), default="bfloat16")
    ap.add_argument("--preset", choices=("full", "tiny"), default="full",
                    help="'tiny' = the dryrun/test model (1-block backbone, "
                         "IR-18, 1-layer ViT, 64-class head) for CPU smoke "
                         "runs; checkpoints/components are not ported")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable backbone rematerialization (needs more HBM)")
    ap.add_argument("--trainable", choices=("branch", "branch+backbone", "all"),
                    default="branch",
                    help="per-task optimizer scope; 'branch' is reference "
                         "parity (the shared trunk is in no optimizer)")
    # multi-chip: (data, model) mesh over all visible devices. DDP+SyncBN
    # equivalence is tested in tests/test_sharding.py (reference semantics:
    # training/yolopt/main.py:46-60)
    ap.add_argument("--data-parallel", type=int, default=0,
                    help="data-axis size; -1 = fill all devices; 0 = no mesh")
    ap.add_argument("--model-parallel", type=int, default=1,
                    help="model-axis size (shards the AdaFace classifier)")
    # multi-host rendezvous (reference: torch.distributed env:// init,
    # training/yolopt/main.py:271-277)
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address for multi-host jax.distributed")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from prpe_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from prpe_tpu.cli.build_model import build_variables
    from prpe_tpu.core.config import (
        CombinedModelConfig, MeshConfig, OptimConfig, PoseConfig, TaskConfig,
        TrainConfig, default_task_configs,
    )
    from prpe_tpu.train.round_robin import RoundRobinTrainer

    if args.coordinator or args.num_processes:
        from prpe_tpu.parallel import distributed

        distributed.initialize(args.coordinator, args.num_processes,
                               args.process_id)

    if args.preset == "tiny":
        # KEEP IN SYNC with __graft_entry__._dryrun_multichip_body's tiny
        # config — identical model => the dryrun/suite compile cache applies
        from prpe_tpu.core.config import AdaFaceConfig, DetectionConfig

        cfg = CombinedModelConfig(
            image_size=args.image_size,
            backbone_stages=(1, 1, 1, 1),
            remat_backbone=not args.no_remat,
            detection=DetectionConfig(
                adapter_size=(args.image_size // 2, args.image_size // 2),
                max_gt=4),
            face=AdaFaceConfig(arch="ir_18", num_classes=64),
            pose=dataclasses.replace(
                PoseConfig(input_size=(32, 32), heatmap_size=(8, 8),
                           vit_hidden=32, vit_layers=1, vit_heads=2),
                sigma=args.pose_sigma, keypoint_thresh=args.keypoint_thresh),
        )
    else:
        cfg = CombinedModelConfig(
            image_size=args.image_size,
            remat_backbone=not args.no_remat,
            pose=dataclasses.replace(
                PoseConfig(), sigma=args.pose_sigma, keypoint_thresh=args.keypoint_thresh
            ),
        )
    # mesh first: loader staging and parameter placement both need it
    mesh = None
    if args.data_parallel != 0 or args.model_parallel > 1:
        from prpe_tpu.parallel.mesh import build_mesh

        mesh = build_mesh(MeshConfig(
            data_parallel=args.data_parallel if args.data_parallel else -1,
            model_parallel=args.model_parallel,
        ))
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    loaders = build_task_loaders(args, cfg)

    if args.tasks:
        keep = [t.strip() for t in args.tasks.split(",") if t.strip()]
        unknown = [t for t in keep if t not in loaders]
        if unknown:
            raise SystemExit(f"--tasks: unknown task(s) {unknown}; "
                             f"choose from {sorted(loaders)}")
        loaders = {k: v for k, v in loaders.items() if k in keep}

    if args.device_resident:
        # stage all epochs NOW — before build_variables executes the first
        # large program (on this environment's loopback relay, any large
        # program execution permanently collapses the host->device link to
        # ~35 MB/s; README "Fed-from-disk"). One device_put per task, then
        # the training loop never touches the link again.
        from prpe_tpu.data.pipeline import device_resident_loader
        from prpe_tpu.parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh) if mesh is not None else None
        budget = args.device_resident_max_gb * 2**30
        total = 0
        for tname, tl in loaders.items():
            for split in ("train", "val"):
                if tl.get(split) is None:
                    continue
                tl[split] = device_resident_loader(
                    tl[split], sharding=sharding,
                    reshuffle=(split == "train"), seed=args.seed,
                    name=f"{tname}/{split}",
                    refresh=(args.device_resident_refresh
                             and split == "train"),
                )
                total += tl[split].total_bytes
                if total > budget:  # checked per loader: stop before OOM
                    raise SystemExit(
                        f"--device-resident exceeded "
                        f"--device-resident-max-gb {args.device_resident_max_gb} "
                        f"({total / 2**30:.2f} GiB staged at {tname}/{split}); "
                        "lower --max-train-samples/--image-size or drop the flag")
        print(f"[device-resident] total staged: {total / 2**20:.0f} MiB",
              flush=True)

    model, variables = build_variables(
        pathlib.Path(args.component_dir), cfg,
        dtype=jnp.dtype(args.dtype).type,
    )

    # keep each task's reference-parity optimizer shape (pose: AdamW +
    # OneCycle + ViT 0.1x group) and inject the CLI lr / schedule horizon.
    # warmup = min(1000, total/5) matches pose_estimation/module.py:688.
    # The horizon uses the loader's ACTUAL steps/epoch (dataset length,
    # max-samples cap, drop-last batching all applied) — deriving it from
    # the cap alone would leave OneCycle pre-anneal forever on datasets
    # smaller than --max-train-samples.
    def task_total_steps(name: str) -> int:
        fallback = max(1, args.max_train_samples // args.batch_size)
        per_epoch = getattr(loaders[name]["train"], "steps_per_epoch", fallback)
        return max(1, args.epochs * max(1, per_epoch))

    tasks = tuple(
        dataclasses.replace(
            t,
            optim=dataclasses.replace(
                t.optim, learning_rate=args.learning_rate,
                total_steps=task_total_steps(t.name),
                warmup_steps=(min(1000, task_total_steps(t.name) // 5)
                              if t.optim.schedule != "constant" else 0),
            ),
            trainable=args.trainable,
        )
        for t in default_task_configs()
        if t.name in loaders
    )
    tcfg = TrainConfig(
        total_epochs=args.epochs, seed=args.seed,
        checkpoint_dir=args.checkpoint_dir, tasks=tasks,
        save_every_epochs=args.save_every,
    )
    if mesh is not None:
        from prpe_tpu.parallel.mesh import make_param_shardings, replicated

        variables = {
            "params": jax.device_put(
                variables["params"],
                make_param_shardings(mesh, variables["params"])),
            "batch_stats": jax.device_put(
                variables["batch_stats"], replicated(mesh)),
        }
    else:
        variables = {k: jax.tree_util.tree_map(jnp.asarray, v)
                     for k, v in variables.items()}
    trainer = RoundRobinTrainer(model, cfg, tcfg, variables, loaders,
                                log_dir=args.log_dir, mesh=mesh)
    if args.resume_checkpoint:
        # "latest" resolves to the newest checkpoint in --checkpoint-dir
        trainer.resume(None if args.resume_checkpoint == "latest"
                       else args.resume_checkpoint)
    try:
        trainer.train()
    finally:
        # shut down decode worker pools (no-op for inline loaders)
        for task_loaders in loaders.values():
            for key in ("train", "val"):
                fn = task_loaders.get(key)
                if fn is not None and hasattr(fn, "close"):
                    fn.close()
                if fn is not None and hasattr(fn, "stats"):
                    s = fn.stats
                    print(f"[device-resident] {key} staging stats: "
                          f"fresh_epochs={s.get('fresh_epochs')} "
                          f"stale_epochs={s.get('stale_epochs')}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
