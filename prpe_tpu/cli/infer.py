"""Cascade inference CLI: enroll identities, then run selective pose on images.

The user-facing surface of the thesis pipeline: detect every person, match
faces against the enrolled gallery, output keypoints only for matched people.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("images", nargs="+", help="input image paths")
    ap.add_argument("--enroll", nargs="*", default=[],
                    help="face images of target identities (gallery)")
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint of cascade variables (optional)")
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--match-threshold", type=float, default=0.4)
    ap.add_argument("--output", default=None, help="write JSON results here")
    ap.add_argument("--preset", choices=("full", "tiny"), default="full",
                    help="'tiny' shrinks every component (IR-18, 1-layer "
                         "ViT) for fast CPU smoke runs / debugging")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from prpe_tpu.core.config import CascadeConfig, DetectionConfig, PoseConfig
    from prpe_tpu.data.image import load_image, resize_image
    from prpe_tpu.infer.cascade import CascadeModel, build_cascade_runner

    if args.preset == "tiny":
        # same geometry as tests/test_cascade.py's fixture, so the test
        # suite's compile cache covers this path
        model = CascadeModel(
            detection=DetectionConfig(pre_nms_top_k=64),
            pose_cfg=PoseConfig(input_size=(64, 48), heatmap_size=(16, 12),
                                vit_hidden=32, vit_layers=1, vit_heads=2),
            irnet_layers=18,
        )
    else:
        model = CascadeModel(detection=DetectionConfig(), pose_cfg=PoseConfig())
    img0 = jnp.zeros((1, args.image_size, args.image_size, 3))
    ph, pw = model.pose_cfg.input_size
    # jit: one compiled init program instead of per-primitive eager dispatch
    variables = jax.jit(
        lambda k, a, b, c: model.init(k, a, b, c, method="init_all")
    )(jax.random.key(0), img0, jnp.zeros((1, 112, 112, 3)),
      jnp.zeros((1, ph, pw, 3)))
    if args.checkpoint:
        import orbax.checkpoint as ocp

        variables = ocp.StandardCheckpointer().restore(
            pathlib.Path(args.checkpoint).absolute(), jax.device_get(variables)
        )

    def load_batch(paths, size):
        out = []
        for p in paths:
            img = resize_image(load_image(p), (size, size))
            out.append(img.astype(np.float32) / 255.0)
        return jnp.asarray(np.stack(out))

    # gallery: embed enrolled faces (full image treated as the face crop)
    if args.enroll:
        crops = load_batch(args.enroll, 112)
        crops = (crops - 0.5) / 0.5
        crops = crops[..., ::-1]
        gallery, _ = jax.jit(
            lambda v, c: model.apply(v, c, method="embed")
        )(variables, crops)
    else:
        gallery = jnp.zeros((1, 512))

    runner = build_cascade_runner(
        model, CascadeConfig(match_threshold=args.match_threshold)
    )
    images = load_batch(args.images, args.image_size)
    res = jax.device_get(runner(variables, images, gallery))

    results = []
    for b, path in enumerate(args.images):
        persons = [
            {"box": res.persons.boxes[b, i].tolist(),
             "score": float(res.persons.scores[b, i]),
             "gated": bool(res.person_gated[b, i])}
            for i in range(res.persons.boxes.shape[1]) if res.persons.valid[b, i]
        ]
        faces = [
            {"box": res.faces.boxes[b, i].tolist(),
             "score": float(res.faces.scores[b, i]),
             "identity": int(res.face_identity[b, i]),
             "similarity": float(res.face_similarity[b, i])}
            for i in range(res.faces.boxes.shape[1]) if res.faces.valid[b, i]
        ]
        poses = [
            {"box": res.pose_boxes[g].tolist(),
             "keypoints": res.pose_keypoints[g].tolist(),
             "scores": res.pose_scores[g].tolist()}
            for g in range(len(res.pose_valid))
            if res.pose_valid[g] and res.pose_image_idx[g] == b
        ]
        results.append({"image": str(path), "persons": persons,
                        "faces": faces, "poses": poses})

    text = json.dumps(results, indent=2)
    if args.output:
        pathlib.Path(args.output).write_text(text)
        print(f"wrote {args.output}")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
