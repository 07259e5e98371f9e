"""Face-verification evaluation CLI (LFW-style pairs).

Evaluates IR-50 embeddings on verification pairs converted from the AdaFace
``.bin`` archives (see prpe_tpu/cli/convert_ms1m.py convert_bin). The
BASELINE north star asks for verification-accuracy parity; the reference only
logs classification accuracy during training.
"""

from __future__ import annotations

import argparse
import io
import json
import pathlib
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pairs", help="npz from convert_ms1m --output (jpegs, issame)")
    ap.add_argument("--checkpoint", default=None, help="orbax IRNet variables")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--arch", default="ir_50",
                    help="IRNet variant (ir_18..ir_se_152); ir_18 for fast "
                         "CPU smoke runs")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from prpe_tpu.eval.verification import verification_accuracy
    from prpe_tpu.nn.irnet import build_irnet

    data = np.load(args.pairs, allow_pickle=True)
    jpegs, issame = data["jpegs"], data["issame"]

    model = build_irnet(args.arch)
    x0 = jnp.zeros((1, 112, 112, 3))
    # jit: one compiled init program instead of per-primitive eager dispatch
    variables = jax.jit(model.init)(jax.random.key(0), x0)
    if args.checkpoint:
        import orbax.checkpoint as ocp

        variables = ocp.StandardCheckpointer().restore(
            pathlib.Path(args.checkpoint).absolute(), jax.device_get(variables)
        )

    @jax.jit
    def embed(batch):
        emb, _ = model.apply(variables, batch)
        return emb

    def decode(j):
        img = np.asarray(Image.open(io.BytesIO(j)).convert("RGB"), np.float32)
        x = (img / 255.0 - 0.5) / 0.5
        return x[..., ::-1]  # BGR

    embs = []
    bs = args.batch_size
    for i in range(0, len(jpegs), bs):
        chunk = np.stack([decode(j) for j in jpegs[i : i + bs]])
        if len(chunk) < bs:  # pad to static batch
            pad = np.zeros((bs - len(chunk), *chunk.shape[1:]), chunk.dtype)
            out = np.asarray(embed(jnp.asarray(np.concatenate([chunk, pad]))))
            embs.append(out[: len(chunk)])
        else:
            embs.append(np.asarray(embed(jnp.asarray(chunk))))
    embs = np.concatenate(embs)

    emb_a, emb_b = embs[0::2], embs[1::2]
    metrics = verification_accuracy(emb_a, emb_b, issame)
    print(json.dumps({k: float(v) for k, v in metrics.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
