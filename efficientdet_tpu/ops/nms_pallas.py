"""Pallas TPU kernel: fused NMS suppression (IoU + masks + fixpoint).

The XLA version of the suppression stage materialises, per image, a K x K
IoU matrix and a K x K boolean suppression matrix in HBM, then re-reads the
matrix on every fixpoint sweep (ops/nms.py). This kernel keeps everything in
VMEM: boxes (K x 4) are loaded once, the suppression matrix is built tile by
tile into a VMEM scratch (bf16: values are exactly 0/1, and the fixpoint
only tests sum > 0.5, so bf16 accumulation is safe), and the fixpoint
matvec sweeps run on the MXU against that scratch. HBM traffic drops from
O(K^2) * sweeps to O(K).

Grid: one program per batch element. K must be a multiple of 128 (the
wrapper pads with invalid candidates, which can never suppress or survive).

Semantics are identical to ``ops.nms._fixpoint_suppress`` over
``sup[j, i] = iou(j, i) > t and class[j] == class[i] and j < i`` with
score-sorted candidates: the unique greedy-NMS keep mask. Exactness is
tested against the XLA path (tests/test_nms_pallas.py) in interpret mode on
CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128


def _suppress_kernel(boxes_ref, classes_ref, valid_ref, out_ref, sup_ref,
                     *, iou_threshold: float, k: int):
    """One batch element: build sup matrix in VMEM, fixpoint, emit keep mask."""
    boxes = boxes_ref[0]  # (K, 4) f32
    classes = classes_ref[0, 0]  # (K,) i32 (blocks carry (1, 1, K) dims)
    valid = valid_ref[0, 0]  # (K,) f32 (1.0 = candidate)

    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 2]
    y2 = boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (K,)

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, k), 1)

    def build_tile(t, _):
        r0 = t * ROW_TILE
        # slice rows through the refs (dynamic value slicing is not lowered)
        tile_boxes = boxes_ref[0, pl.ds(r0, ROW_TILE), :]  # (T, 4)
        rx1 = tile_boxes[:, 0]
        ry1 = tile_boxes[:, 1]
        rx2 = tile_boxes[:, 2]
        ry2 = tile_boxes[:, 3]
        rarea = jnp.maximum(rx2 - rx1, 0.0) * jnp.maximum(ry2 - ry1, 0.0)
        rcls = classes_ref[0, 0, pl.ds(r0, ROW_TILE)]

        iw = jnp.minimum(rx2[:, None], x2[None, :]) - jnp.maximum(
            rx1[:, None], x1[None, :]
        )
        ih = jnp.minimum(ry2[:, None], y2[None, :]) - jnp.maximum(
            ry1[:, None], y1[None, :]
        )
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)  # (T, K)
        union = rarea[:, None] + area[None, :] - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)

        same = rcls[:, None] == classes[None, :]
        row_idx = r0 + jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, k), 0)
        sup = (iou > iou_threshold) & same & (row_idx < col_idx)
        sup_ref[pl.ds(r0, ROW_TILE), :] = sup.astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, k // ROW_TILE, build_tile, 0)

    # Fixpoint: keep[i] = valid[i] & !any_j keep[j] * sup[j, i].
    keep0 = valid.reshape(1, k)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        suppressed = jax.lax.dot_general(
            keep.astype(jnp.bfloat16),
            sup_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, K)
        new_keep = jnp.where(suppressed > 0.5, 0.0, valid.reshape(1, k))
        return new_keep, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0) - 1.0, jnp.int32(0))
    )
    out_ref[0, 0] = keep[0]


def suppression_keep_mask(
    boxes: jax.Array,
    classes: jax.Array,
    valid: jax.Array,
    iou_threshold: float = 0.5,
    interpret: bool = False,
) -> jax.Array:
    """Greedy per-class NMS keep mask for score-sorted candidates.

    Args:
      boxes: (B, K, 4) f32 xyxy, sorted by descending score within each row.
      classes: (B, K) int32.
      valid: (B, K) bool.
    Returns keep: (B, K) bool.
    """
    b, k, _ = boxes.shape
    pad = (-k) % ROW_TILE
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        classes = jnp.pad(classes, ((0, 0), (0, pad)), constant_values=-1)
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    kp = k + pad

    kernel = functools.partial(
        _suppress_kernel, iou_threshold=iou_threshold, k=kp
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kp, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, kp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kp, kp), jnp.bfloat16)],
        interpret=interpret,
    )(
        boxes.astype(jnp.float32),
        classes.astype(jnp.int32).reshape(b, 1, kp),
        valid.astype(jnp.float32).reshape(b, 1, kp),
    )
    return out[:, 0, :k] > 0.5
