"""Serialize a jitted inference function for deployment.

The TPU-native counterpart of the reference's ONNX export
(reference: training/yolopt/util.py:47-73): ``jax.export`` serializes the
StableHLO of the compiled eval graph + its calling convention into a portable
artifact loadable from any JAX (or IFRT/PJRT) runtime, and
``save_inference_checkpoint`` is the ``strip_optimizer`` analogue
(reference: training/yolopt/util.py:332-337) — params-only, bf16.
"""

from __future__ import annotations

import argparse
import pathlib
import sys


_RESULTS_REGISTERED = False


def register_result_serialization() -> None:
    """Register the cascade's namedtuple result types with jax.export so
    serialized artifacts can carry them in their output pytree (idempotent)."""
    global _RESULTS_REGISTERED
    if _RESULTS_REGISTERED:
        return
    from jax import export as jexport

    from prpe_tpu.infer.cascade import CascadeResult
    from prpe_tpu.ops.nms import Detections

    for t in (Detections, CascadeResult):
        jexport.register_namedtuple_serialization(
            t, serialized_name=f"prpe_tpu.{t.__name__}")
    _RESULTS_REGISTERED = True


def export_stablehlo(fn, example_args, path: pathlib.Path):
    import jax
    from jax import export as jexport

    register_result_serialization()
    exp = jexport.export(jax.jit(fn))(*example_args)
    path.write_bytes(exp.serialize())
    return path


def save_inference_checkpoint(variables, path: pathlib.Path):
    """Params-only bf16 checkpoint (strip_optimizer analogue)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    def shrink(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, jnp.bfloat16)
        return x

    slim = jax.tree_util.tree_map(shrink, jax.device_get(variables))
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path.absolute(), slim, force=True)
    # newer orbax saves asynchronously; block so the artifact is committed
    # before the process can exit (same fix as train/checkpoint.py)
    wait = getattr(ckpt, "wait_until_finished", None)
    if wait is not None:
        wait()
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="yolo", choices=["yolo", "irnet", "vitpose", "combined_pose"])
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--output", default="exported.stablehlo")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.model == "yolo":
        from prpe_tpu.nn.yolo import YOLO, decode_predictions

        model = YOLO(nc=1)
        x = jnp.zeros((args.batch_size, args.image_size, args.image_size, 3))
        variables = jax.jit(model.init)(jax.random.key(0), x)

        def fn(v, x):
            return decode_predictions(model.apply(v, x), nc=1)

    elif args.model == "irnet":
        from prpe_tpu.nn.irnet import build_irnet

        model = build_irnet("ir_50")
        x = jnp.zeros((args.batch_size, 112, 112, 3))
        variables = jax.jit(model.init)(jax.random.key(0), x)
        fn = lambda v, x: model.apply(v, x)
    elif args.model == "vitpose":
        from prpe_tpu.nn.vit import ViTPose

        model = ViTPose()
        x = jnp.zeros((args.batch_size, 256, 192, 3))
        variables = jax.jit(model.init)(jax.random.key(0), x)
        fn = lambda v, x: model.apply(v, x)
    else:  # combined_pose
        from prpe_tpu.models.combined import CombinedModel

        model = CombinedModel()
        x = jnp.zeros((args.batch_size, args.image_size, args.image_size, 3))
        variables = jax.jit(
            lambda k, xx: model.init(k, xx, method="pose")
        )(jax.random.key(0), x)
        fn = lambda v, x: model.apply(v, x, method="pose")

    out = export_stablehlo(fn, (variables, x), pathlib.Path(args.output))
    print(f"exported {args.model} to {out} ({out.stat().st_size} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
