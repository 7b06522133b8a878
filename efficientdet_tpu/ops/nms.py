"""Fully on-device, static-shape, per-class non-maximum suppression.

TPU-native replacement for the reference's ``FilterDetections`` layer
(SURVEY.md SS2 "Custom layers": score threshold 0.01, per-class NMS IoU 0.5,
max_detections=100, padded fixed-size output), which relied on
``tf.image.non_max_suppression`` — unavailable and shape-dynamic. This is the
"hard part #1" of SURVEY.md SS7.

Algorithm (greedy global selection with same-class suppression):

1. Flatten the (A, C) score grid, mask scores below the threshold, and take
   the global top-K candidate (anchor, class) pairs (K static, default 1000).
2. ``max_detections`` iterations of: pick the argmax-scoring live candidate,
   emit it, and kill every live candidate of the *same class* whose IoU with
   it exceeds the threshold.

This is mathematically identical to per-class sequential NMS followed by a
global top-``max_detections`` by score (a candidate is suppressed iff a
higher-scoring emitted candidate of its class overlaps it), but runs as a
fixed-trip-count ``lax.fori_loop`` of cheap O(K) vector steps — static
shapes, vmappable over the batch, shardable over a data mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from efficientdet_tpu.anchors import iou_matrix
from efficientdet_tpu.configs import EvalConfig

_NEG_INF = -1e9


def filter_detections(
    boxes: jax.Array,
    scores: jax.Array,
    score_threshold: float = 0.01,
    nms_iou_threshold: float = 0.5,
    max_detections: int = 100,
    pre_nms_top_k: int = 1000,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-class NMS for one image.

    Args:
      boxes: (A, 4) decoded xyxy boxes.
      scores: (A, C) per-class sigmoid scores.
      score_threshold / nms_iou_threshold / max_detections: reference
        FilterDetections semantics.
      pre_nms_top_k: static size of the global candidate pool.

    Returns:
      det_boxes: (max_detections, 4) float32, zero-padded.
      det_scores: (max_detections,) float32, -1-padded (reference pads -1).
      det_classes: (max_detections,) int32, -1-padded.
      num_valid: () int32.
    """
    num_anchors, num_classes = scores.shape
    k = min(pre_nms_top_k, num_anchors * num_classes)

    flat = scores.astype(jnp.float32).reshape(-1)
    flat = jnp.where(flat > score_threshold, flat, _NEG_INF)
    top_scores, top_idx = jax.lax.top_k(flat, k)  # (K,)
    cand_anchor = top_idx // num_classes
    cand_class = (top_idx % num_classes).astype(jnp.int32)
    cand_boxes = jnp.take(boxes.astype(jnp.float32), cand_anchor, axis=0)  # (K,4)

    # Pairwise IoU over the candidate pool, gated by class equality, computed
    # once up front — the loop then only does masked row lookups.
    ious = iou_matrix(cand_boxes, cand_boxes)  # (K, K)
    same_class = cand_class[:, None] == cand_class[None, :]
    suppress_mat = (ious > nms_iou_threshold) & same_class  # (K, K)

    def body(i, state):
        live_scores, out_boxes, out_scores, out_classes = state
        sel = jnp.argmax(live_scores)
        sel_score = live_scores[sel]
        valid = sel_score > _NEG_INF / 2

        out_boxes = out_boxes.at[i].set(
            jnp.where(valid, cand_boxes[sel], jnp.zeros(4, jnp.float32))
        )
        out_scores = out_scores.at[i].set(jnp.where(valid, sel_score, -1.0))
        out_classes = out_classes.at[i].set(
            jnp.where(valid, cand_class[sel], jnp.int32(-1))
        )

        kill = suppress_mat[sel] | (
            jax.lax.broadcasted_iota(jnp.int32, (k,), 0) == sel
        )
        live_scores = jnp.where(kill & valid, _NEG_INF, live_scores)
        # If nothing valid remains, freeze the pool (already all -inf).
        return live_scores, out_boxes, out_scores, out_classes

    init = (
        top_scores,
        jnp.zeros((max_detections, 4), jnp.float32),
        jnp.full((max_detections,), -1.0, jnp.float32),
        jnp.full((max_detections,), -1, jnp.int32),
    )
    _, det_boxes, det_scores, det_classes = jax.lax.fori_loop(
        0, max_detections, body, init
    )
    num_valid = jnp.sum((det_scores > 0).astype(jnp.int32))
    return det_boxes, det_scores, det_classes, num_valid


def batched_filter_detections(
    boxes: jax.Array,
    scores: jax.Array,
    config: EvalConfig = EvalConfig(),
):
    """vmap of :func:`filter_detections` over the batch dimension.

    Args: boxes (B, A, 4), scores (B, A, C).
    """
    fn = functools.partial(
        filter_detections,
        score_threshold=config.score_threshold,
        nms_iou_threshold=config.nms_iou_threshold,
        max_detections=config.max_detections,
        pre_nms_top_k=config.pre_nms_top_k,
    )
    return jax.vmap(fn)(boxes, scores)
