"""Build the combined multi-task model from pretrained component checkpoints.

The TPU equivalent of the reference's model-surgery script
(reference: training/modify_models.py:497-534): load torch checkpoints for
ResNet-50 / YOLOv11-n x2 / AdaFace IR-50 / ViTPose-B, port them into the
flax CombinedModel (prpe_tpu/models/porting.py), apply the same surgeries
(1-class detection heads keeping box branches, reference :156-180; AdaFace
input-layer replacement, reference :266-275), and save the assembled
variables with orbax.

Missing checkpoint files degrade to fresh initialization for that component,
so the command always produces a loadable model.
"""

from __future__ import annotations

import argparse
import pathlib
import sys


def build_variables(component_dir: pathlib.Path, cfg=None, log=print, dtype=None):
    import jax
    import jax.numpy as jnp

    from prpe_tpu.core.config import CombinedModelConfig
    from prpe_tpu.models import porting
    from prpe_tpu.models.combined import CombinedModel

    cfg = cfg or CombinedModelConfig()
    model = CombinedModel(config=cfg, dtype=dtype or jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))

    # jit the init: eager flax init dispatches each primitive as its own
    # XLA program (minutes of compile on a small host / remote-compile
    # relay); under jit the whole init is ONE compiled program.
    def _init(key, xx, labels):
        return model.init(key, xx, labels, method="init_all")

    variables = jax.jit(_init)(
        jax.random.key(0), x, jnp.zeros((1,), jnp.int32)
    )
    variables = jax.device_get(variables)

    def load_torch(path):
        import torch

        return torch.load(path, map_location="cpu", weights_only=False)

    # --- ResNet-50 trunk ------------------------------------------------- #
    rn_path = component_dir / "resnet50.pth"
    if rn_path.exists():
        sd = porting.to_numpy_state_dict(load_torch(rn_path))
        ported = porting.port_resnet50(sd)
        variables = _merge_into(variables, "backbone", ported)
        log(f"ported ResNet-50 from {rn_path}")
    else:
        log(f"[fresh init] backbone (no {rn_path})")

    # --- YOLO branches (head surgery keeps all but final cls conv) -------- #
    # The reference builds BOTH branches from yolo11n.pt even though its
    # downloader fetches yolov11n-face.pt (training/modify_models.py:197 vs
    # scripts/download_models.py:11 — a quirk, SURVEY.md §7). We implement
    # the intended behavior: the face branch prefers the face weights and
    # falls back to the person weights to match the reference.
    face_candidates = ["yolov11n-face.pt", "yolo11n.pt"]
    face_file = next(
        (f for f in face_candidates if (component_dir / f).exists()),
        face_candidates[-1],
    )
    for branch, fname in (("yolo_person", "yolo11n.pt"),
                          ("yolo_face", face_file)):
        yp = component_dir / fname
        if yp.exists():
            ckpt = load_torch(yp)
            m = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
            sd = porting.to_numpy_state_dict(
                m.state_dict() if hasattr(m, "state_dict") else m
            )
            ported = porting.port_yolo(sd, variant=cfg.detection.variant)
            # nc=80 -> nc=1 surgery: drop the pretrained final cls conv
            for hp in (ported["params"]["head"],):
                for l in range(3):
                    hp.pop(f"cls{l}_out", None)
            variables = _merge_into(variables, branch, ported)
            log(f"ported {branch} from {yp} (cls head re-initialized, nc=1)")
        else:
            log(f"[fresh init] {branch} (no {yp})")

    # --- AdaFace IR-50 (skip input layer; adapter feeds 64 channels) ------ #
    ap = component_dir / "adaface_ir50_ms1mv2.ckpt"
    if ap.exists():
        ckpt = load_torch(ap)
        sd = ckpt.get("state_dict", ckpt)
        sd = {k.replace("module.", "").replace("model.", ""): v for k, v in sd.items()}
        ported = porting.port_irnet(
            porting.to_numpy_state_dict(sd), num_layers=50, skip_input_layer=True
        )
        variables = _merge_into(variables, "ada_face", ported)
        log(f"ported AdaFace IR-50 from {ap} (input layer re-initialized)")
    else:
        log(f"[fresh init] ada_face (no {ap})")

    # --- ViTPose-B -------------------------------------------------------- #
    vp = component_dir / "vitpose-base-simple.pth"
    if vp.exists():
        sd = porting.to_numpy_state_dict(load_torch(vp))
        ported = porting.port_vitpose(sd)
        variables = _merge_into(variables, "vit_pose", ported)
        log(f"ported ViTPose-B from {vp}")
    else:
        log(f"[fresh init] vit_pose (no {vp})")

    return model, variables


def _merge_into(variables, branch, ported):
    from prpe_tpu.models import porting

    out = {k: dict(v) for k, v in variables.items()}
    for col in ported:
        base = out.setdefault(col, {}).get(branch, {})
        out[col][branch] = porting.merge_variables(base, ported[col])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--component-dir", default="component_models")
    ap.add_argument("--output", default="edited_components/combined_model")
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp

    model, variables = build_variables(pathlib.Path(args.component_dir))
    out = pathlib.Path(args.output).absolute()
    ocp.StandardCheckpointer().save(out, variables, force=True)
    print(f"saved combined model variables to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
