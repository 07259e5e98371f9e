"""Pallas TPU kernel for greedy NMS suppression.

The lax implementation (prpe_tpu/ops/nms.py) runs the sequential greedy scan
as a K-step ``fori_loop`` over HBM-resident arrays; every step is a tiny
vector op and the loop is launch-latency-bound. This kernel keeps the whole
(K, K) suppression matrix in VMEM and runs the scan entirely on-core:

  * one kernel invocation per image (grid = batch)
  * the IoU-threshold matrix is computed by the VPU in VMEM
  * the greedy scan reads one row per step from VMEM (no HBM traffic)

Block shapes: Mosaic requires the last two block dims to be (multiple of 8,
multiple of 128) or exactly the array dims — so boxes ride as (1, K, 4)
blocks and the (B, K) masks as (1, 1, K) blocks (leading dims squeezed
in-kernel). K is capped by the caller (prpe_tpu/ops/nms.py) so the (K, K)
fp32 IoU matrix and its bool threshold stay comfortably inside ~16 MB VMEM.

Exactness matches the reference algorithm (training/yolopt/util.py:123-169
via torchvision.ops.nms) — verified against the lax path in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# largest candidate count routed to this kernel: the (K, K) fp32 suppress
# scratch (4 MB at K=1024) plus one (TILE, K) row-tile of IoU temporaries
# must fit VMEM with headroom. Covers both the cascade (256) and the eval
# path (DetectionConfig.pre_nms_top_k = 1024).
MAX_PALLAS_K = 1024

# rows of the suppress matrix built per step: bounds live IoU temporaries to
# ~6 * TILE * K * 4 bytes (6 MB at K=1024) instead of 6 full (K, K) arrays
_ROW_TILE = 256


def _nms_kernel(boxes_ref, valid_ref, keep_ref, sup_ref, *, iou_threshold: float):
    boxes = boxes_ref[0]  # (K, 4) f32 (class-offset already applied)
    k = boxes.shape[0]

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    # build the thresholded suppression matrix row-tile by row-tile so the
    # (TILE, K) IoU intermediates never exceed VMEM, parking the result in
    # scratch: the scan reads one row per step via ref dynamic-slicing
    # (value-level dynamic_slice has no Mosaic lowering; scalar picks are
    # one-hot reductions for the same reason)
    tile = min(_ROW_TILE, k)
    for t0 in range(0, k, tile):
        sl = slice(t0, min(t0 + tile, k))  # explicit remainder slice
        # slice to 1D before adding the broadcast axis: x1[sl, None] mixes a
        # partial slice with None, which traces as a gather Mosaic can't lower
        col = lambda v: v[sl][:, None]  # noqa: B023 - loop body consumed here
        ix1 = jnp.maximum(col(x1), x1[None, :])
        iy1 = jnp.maximum(col(y1), y1[None, :])
        ix2 = jnp.minimum(col(x2), x2[None, :])
        iy2 = jnp.minimum(col(y2), y2[None, :])
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        iou = inter / (col(area) + area[None, :] - inter + 1e-7)
        sup_ref[sl, :] = (iou > iou_threshold).astype(jnp.float32)

    valid = (valid_ref[0] != 0).astype(jnp.float32)  # (1, K)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    # candidates arrive score-sorted, so validity is (in practice) a prefix:
    # bound the serial scan at the last valid index instead of K. The scan is
    # the kernel's critical path — with a handful of real detections this is
    # a ~100x trip-count cut. (Correct for any mask, not just prefixes: the
    # bound is max(index of valid)+1.)
    n_iter = jnp.max((col + 1) * valid.astype(jnp.int32))

    def body(i, carry):
        keep, suppressed = carry  # (1, K) f32 0/1
        onehot = (col == i).astype(jnp.float32)
        row_i = sup_ref[pl.ds(i, 1), :]  # (1, K)
        val_i = jnp.sum(valid * onehot)
        sup_i = jnp.minimum(jnp.sum(suppressed * onehot), 1.0)
        is_kept = val_i * (1.0 - sup_i)  # scalar 0/1
        keep = keep + onehot * is_kept
        suppressed = jnp.maximum(suppressed, is_kept * row_i)
        return keep, suppressed

    zeros = jnp.zeros((1, k), jnp.float32)
    keep, _ = jax.lax.fori_loop(0, n_iter, body, (zeros, zeros))
    keep_ref[0] = (keep > 0.0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_greedy_nms(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.65,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched greedy-NMS keep mask.

    Args:
      boxes: (B, K, 4) xyxy, score-descending per image, class offsets
        already added.
      valid: (B, K) candidate validity.

    Returns keep: (B, K) bool.
    """
    b, k, _ = boxes.shape
    kernel = functools.partial(_nms_kernel, iou_threshold=iou_threshold)
    keep = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes.astype(jnp.float32), valid.astype(jnp.int32)[:, None, :])
    return keep[:, 0, :].astype(jnp.bool_)
