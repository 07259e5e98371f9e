"""Train a synthetic ViTPose-B checkpoint for the bf16 numerics check.

Random-init ViTPose heatmaps are noise, and the argmax decode of noise is
maximally dtype-sensitive — a fp32-vs-bf16 keypoint comparison over random
weights measures nothing (the same lesson as round 4's random detectors
and NMS churn). This trains the full-geometry ViTPose (768x12x12, 256x192
crops, 17 keypoints) on synthetic skeleton crops until the heatmaps have
real peaks (pck_px >= 0.8), then saves a params checkpoint that
tools/check_cascade_numerics.py --pose-ckpt loads into BOTH dtype
variants of the cascade.

Usage: python tools/make_numerics_pose_ckpt.py [--steps 400]
                                               [--out runs/r5_numerics/pose_ckpt]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))


def make_crop_batch(rng, n, h=256, w=192):
    """Crops matching what the CASCADE's pose stage actually sees
    (check_cascade_numerics scenes -> detected person box -> ROI
    crop_and_resize): the bright flat-color person rectangle fills most of
    the 256x192 frame (the crop IS the box, plus detection-box slack), a
    brighter face strip in the top quarter, colored skeleton dots (~6-8px
    after the box->crop resize), dark noise in any border slack. A pose
    checkpoint trained on mismatched crops produced no peaks on the real
    cascade crops and the cross-dtype comparison stayed noise-vs-noise."""
    from make_synthetic_multitask_data import _KP_COLORS, _SKELETON

    imgs = np.empty((n, h, w, 3), np.float32)
    kps = np.zeros((n, 1, 17, 3), np.float32)
    areas = np.zeros((n, 1), np.float32)
    for i in range(n):
        img = rng.uniform(0, 0.25, (h, w, 3))
        # detected box ~= drawn box: crop fills 80-100% of the frame
        bw = rng.uniform(0.8, 1.0) * w
        bh = rng.uniform(0.8, 1.0) * h
        x0 = rng.uniform(0, w - bw)
        y0 = rng.uniform(0, h - bh)
        color = rng.integers(120, 255, 3) / 255.0
        img[int(y0):int(y0 + bh), int(x0):int(x0 + bw)] = color
        fh = max(int(bh) // 4, 16)
        img[int(y0):int(y0 + fh), int(x0):int(x0 + bw)] = (
            rng.integers(180, 255, 3) / 255.0)
        pts = _SKELETON + rng.normal(0, 0.02, _SKELETON.shape)
        for k in range(17):
            # clamp into the crop: jittered template points can leave the
            # box and an out-of-frame center makes the disc slices empty
            kx = float(np.clip(x0 + pts[k, 0] * bw, 1, w - 2))
            ky = float(np.clip(y0 + pts[k, 1] * bh, 1, h - 2))
            r = int(rng.integers(5, 9))  # scene r=7px through box->crop resize
            ys, xs = np.ogrid[-r:r + 1, -r:r + 1]
            disc = ys * ys + xs * xs <= r * r
            yy, xx = int(ky), int(kx)
            y1, y2 = max(yy - r, 0), min(yy + r + 1, h)
            x1, x2 = max(xx - r, 0), min(xx + r + 1, w)
            img[y1:y2, x1:x2][disc[r - (yy - y1): r + (y2 - yy),
                                   r - (xx - x1): r + (x2 - xx)]] = _KP_COLORS[k]
            kps[i, 0, k] = (kx / w, ky / h, 2)
        imgs[i] = img
        areas[i, 0] = bw * bh
    return imgs, kps, areas


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=str(ROOT / "runs" / "r5_numerics" / "pose_ckpt"))
    ap.add_argument("--init-from", default=None,
                    help="existing pose_ckpt to continue training from")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import orbax.checkpoint as ocp

    from prpe_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    from prpe_tpu.nn.vit import ViTPose
    from prpe_tpu.ops.heatmap import decode_heatmaps, generate_target_heatmaps
    from prpe_tpu.ops.losses import joints_mse_loss, pck_accuracy

    model = ViTPose(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 256, 192, 3)))
    params = variables["params"]
    if args.init_from:
        import pathlib as _pl

        params = ocp.StandardCheckpointer().restore(
            _pl.Path(args.init_from).absolute(),
            {"params": jax.device_get(params)})["params"]
        params = jax.tree_util.tree_map(jnp.asarray, params)
        print(f"continuing from {args.init_from}")
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=100, decay_steps=args.steps)
    tx = optax.adam(sched)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, imgs, hm_t, w_t):
        def loss_fn(p):
            pred = model.apply({"params": p}, imgs)
            return joints_mse_loss(pred.astype(jnp.float32), hm_t, w_t)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for i in range(args.steps):
        imgs, kps, areas = make_crop_batch(rng, args.batch)
        hm_t, w_t = generate_target_heatmaps(
            jnp.asarray(kps[..., :2]), jnp.asarray(kps[..., 2]),
            jnp.asarray(areas), heatmap_size=(64, 48), sigma=2.0)
        params, opt, loss = step(params, opt, jnp.asarray(imgs), hm_t, w_t)
        if i % 50 == 0:
            print(f"step {i}: loss {float(loss):.5f}", flush=True)

    # validation: argmax-decoded pck on fresh crops
    imgs, kps, areas = make_crop_batch(rng, 32)
    pred = model.apply({"params": params}, jnp.asarray(imgs))
    coords, _ = decode_heatmaps(jnp.asarray(pred, jnp.float32))
    pck = float(pck_accuracy(coords * 256, jnp.asarray(kps[:, 0, :, :2]) * 256,
                             jnp.asarray(kps[:, 0, :, 2]),
                             jnp.asarray(areas[:, 0])))
    print(f"final pck_px(ish): {pck:.3f}")
    out = pathlib.Path(args.out).absolute()
    if out.exists():
        import shutil

        shutil.rmtree(out)
    # params-only structure consumed by check_cascade_numerics --pose-ckpt
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(out, {"params": jax.device_get(params)})
    # block the async commit — exiting immediately races interpreter
    # shutdown and tears the checkpoint (see train/checkpoint.py::_wait)
    wait = getattr(ckpt, "wait_until_finished", None)
    if wait is not None:
        wait()
    print(f"saved {out}")
    if pck < 0.8:
        raise SystemExit(f"pose ckpt underqualified: pck {pck:.3f} < 0.8")


if __name__ == "__main__":
    main()
