"""Loss-function tests: goldens vs numpy transcriptions + end-to-end
detection-loss behavior on a synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from prpe_tpu.ops import losses


# --------------------------------------------------------------------------
# elementwise losses
# --------------------------------------------------------------------------

def test_bce_with_logits(rng):
    x = rng.normal(size=(5, 7)).astype(np.float32)
    t = rng.uniform(size=(5, 7)).astype(np.float32)
    got = np.asarray(losses.bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    p = 1 / (1 + np.exp(-x))
    want = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_softmax_ce(rng):
    x = rng.normal(size=(6, 9)).astype(np.float32)
    y = rng.integers(0, 9, size=(6,))
    got = np.asarray(losses.softmax_cross_entropy(jnp.asarray(x), jnp.asarray(y)))
    e = np.exp(x - x.max(-1, keepdims=True))
    logp = np.log(e / e.sum(-1, keepdims=True))
    want = -logp[np.arange(6), y]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_df_loss_exact_bin():
    """A target sitting exactly on a bin with a confident prediction -> ~0."""
    reg_max = 16
    dist = np.full((1, 1, 4, reg_max), -20.0, np.float32)
    target = np.array([[[3.0, 7.0, 2.0, 9.0]]], np.float32)
    for i, t in enumerate([3, 7, 2, 9]):
        dist[0, 0, i, t] = 20.0
    got = float(np.asarray(losses._df_loss(jnp.asarray(dist), jnp.asarray(target))).squeeze())
    assert got < 1e-3


# --------------------------------------------------------------------------
# pose losses
# --------------------------------------------------------------------------

def test_joints_mse_ohkm_selects_hardest(rng):
    B, K, H, W = 2, 17, 8, 6
    pred = np.zeros((B, K, H, W), np.float32)
    target = np.zeros_like(pred)
    # make keypoint 5 by far the hardest
    pred[:, 5] = 10.0
    tw = np.ones((B, K), np.float32)
    full = float(
        losses.joints_mse_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(tw),
            use_ohkm=True, ohkm_topk=8,
        )
    )
    # numpy check: per-joint mse * weights, top-8 sum / (B * topk)
    sig = np.array(
        [.026, .025, .025, .035, .035, .079, .079, .072, .072, .062, .062,
         .107, .107, .087, .087, .089, .089], np.float32)
    kw = (1 / (sig + 1e-8)); kw = kw / kw.mean()
    pj = ((pred - target) ** 2).reshape(B, K, -1).mean(-1) * tw * kw
    topk = np.sort(pj, axis=1)[:, -8:]
    want = topk.sum() / (B * 8)
    np.testing.assert_allclose(full, want, rtol=1e-5)


def test_oks_loss_zero_distance(rng):
    B, K = 3, 17
    coords = rng.uniform(size=(B, K, 2)).astype(np.float32)
    vis = np.ones((B, K), np.float32) * 2
    areas = np.full((B,), 10000.0, np.float32)
    loss = float(
        losses.oks_loss(jnp.asarray(coords), jnp.asarray(coords), jnp.asarray(vis), jnp.asarray(areas))
    )
    assert loss < 1e-5  # perfect prediction -> -log(1) = 0


def test_oks_loss_increases_with_distance(rng):
    B, K = 2, 17
    t = rng.uniform(0.3, 0.7, size=(B, K, 2)).astype(np.float32)
    vis = np.ones((B, K), np.float32)
    areas = np.full((B,), 0.04, np.float32)  # normalized coords -> small area
    near = float(losses.oks_loss(jnp.asarray(t + 0.01), jnp.asarray(t), jnp.asarray(vis), jnp.asarray(areas)))
    far = float(losses.oks_loss(jnp.asarray(t + 0.1), jnp.asarray(t), jnp.asarray(vis), jnp.asarray(areas)))
    assert far > near > 0


# --------------------------------------------------------------------------
# full detection loss
# --------------------------------------------------------------------------

def make_det_batch(rng, B=2, size=64, nc=1, M=4, reg_max=16):
    strides = (8, 16, 32)
    outs = []
    for s in strides:
        h = size // s
        outs.append(rng.normal(0, 0.5, size=(B, h, h, 4 * reg_max + nc)).astype(np.float32))
    gt_boxes = np.zeros((B, M, 4), np.float32)
    gt_labels = np.zeros((B, M), np.int32)
    gt_mask = np.zeros((B, M), bool)
    # 2 valid boxes per image, normalized cxcywh
    for b in range(B):
        gt_boxes[b, 0] = [0.3, 0.3, 0.25, 0.3]
        gt_boxes[b, 1] = [0.7, 0.6, 0.2, 0.2]
        gt_mask[b, :2] = True
    return outs, gt_labels, gt_boxes, gt_mask


def test_detection_loss_finite_and_positive(rng):
    outs, gl, gb, gm = make_det_batch(rng)
    loss = jax.jit(
        lambda o, a, b, c: losses.yolo_detection_loss(o, a, b, c, num_classes=1)
    )([jnp.asarray(o) for o in outs], jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gm))
    for v in loss:
        assert np.isfinite(float(v))
    assert float(loss.total) > 0
    np.testing.assert_allclose(
        float(loss.total), float(loss.box + loss.cls + loss.dfl), rtol=1e-5
    )


def test_detection_loss_no_gt(rng):
    outs, gl, gb, gm = make_det_batch(rng)
    gm[:] = False
    loss = losses.yolo_detection_loss(
        [jnp.asarray(o) for o in outs], jnp.asarray(gl), jnp.asarray(gb),
        jnp.asarray(gm), num_classes=1,
    )
    # no foreground: box/dfl zero, cls pushes everything to background
    assert float(loss.box) == 0.0
    assert float(loss.dfl) == 0.0
    assert float(loss.cls) > 0.0


def test_detection_loss_grad_flows(rng):
    outs, gl, gb, gm = make_det_batch(rng)

    def f(outs):
        return losses.yolo_detection_loss(
            outs, jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gm), num_classes=1
        ).total

    grads = jax.grad(f)([jnp.asarray(o) for o in outs])
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in grads)
    assert np.isfinite(total) and total > 0


def test_detection_loss_perfect_prediction_lower(rng):
    """Constructed near-perfect logits must yield a lower loss than noise."""
    outs, gl, gb, gm = make_det_batch(rng)
    noisy = [jnp.asarray(o) for o in outs]
    l_noise = float(
        losses.yolo_detection_loss(noisy, jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gm), num_classes=1).total
    )
    # background-confident everywhere: cls logits very negative
    quiet = []
    for o in outs:
        q = o.copy()
        q[..., 64:] = -8.0
        quiet.append(jnp.asarray(q))
    l_quiet = float(
        losses.yolo_detection_loss(quiet, jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gm), num_classes=1).total
    )
    assert l_quiet < l_noise
