"""Anchor generation, box encoding/decoding, and on-device target assignment.

TPU-native rebuild of the reference's ``utils/anchors.py`` +
``utils/compute_overlap.pyx`` pair (SURVEY.md SS2 "Anchors",
"Native: IoU kernel"). Two key departures from the reference design:

* Anchors for a given image size are generated once on the host (numpy) and
  closed over by jitted programs, where XLA constant-folds them. The
  reference regenerated them per generator construction.
* Anchor-target assignment (the reference's ``anchor_targets_bbox`` whose hot
  loop was a Cython ``compute_overlap``) is a pure vectorised JAX function
  that runs *inside* the jitted train step — no host round-trip, no Cython.

Box parameterisation follows the reference lineage: targets are *corner*
offsets ``(gt_corner - anchor_corner) / anchor_extent`` normalised by
mean=0, std=0.2 (SURVEY.md SS2 "Custom layers": RegressBoxes; "Anchors":
bbox_transform). All boxes are ``[x1, y1, x2, y2]`` in pixels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configs import AnchorConfig

BOX_MEAN = (0.0, 0.0, 0.0, 0.0)
BOX_STD = (0.2, 0.2, 0.2, 0.2)


# ---------------------------------------------------------------------------
# Anchor generation (host-side, constant-folded under jit)
# ---------------------------------------------------------------------------


def _cell_anchors(size: float, ratios, scales) -> np.ndarray:
    """(R*S, 4) anchors centred at the origin for one pyramid level.

    ``ratio`` is height/width; the anchor preserves area ``(size*scale)^2``.
    Ordering is ratio-major to match the reference's
    ``generate_anchors`` (scales tile fastest).
    """
    ratios = np.asarray(ratios, np.float32)
    scales = np.asarray(scales, np.float32)
    num = len(ratios) * len(scales)
    # scales tile fastest: (r0s0, r0s1, r0s2, r1s0, ...)
    scale_grid = np.tile(scales, len(ratios))
    ratio_grid = np.repeat(ratios, len(scales))
    base = size * scale_grid
    w = base / np.sqrt(ratio_grid)
    h = base * np.sqrt(ratio_grid)
    anchors = np.zeros((num, 4), np.float32)
    anchors[:, 0] = -w / 2.0
    anchors[:, 1] = -h / 2.0
    anchors[:, 2] = w / 2.0
    anchors[:, 3] = h / 2.0
    return anchors


@functools.lru_cache(maxsize=32)
def anchors_for_shape(
    image_shape: Tuple[int, int],
    config: AnchorConfig = AnchorConfig(),
) -> np.ndarray:
    """All anchors for an image, concatenated over P3..P7.

    Returns (A, 4) float32 ``[x1, y1, x2, y2]``. Row order is
    level-major, then row-major over cells, then the 9 per-cell anchors —
    matching the flattened prediction order of the heads.
    """
    ih, iw = image_shape
    all_levels = []
    for stride, size in zip(config.strides, config.sizes):
        fh = -(-ih // stride)  # ceil division
        fw = -(-iw // stride)
        cell = _cell_anchors(size, config.ratios, config.scales)  # (K,4)
        cx = (np.arange(fw, dtype=np.float32) + 0.5) * stride
        cy = (np.arange(fh, dtype=np.float32) + 0.5) * stride
        centers = np.stack(
            np.meshgrid(cx, cy), axis=-1
        ).reshape(-1, 2)  # (fh*fw, 2) row-major
        shifts = np.concatenate([centers, centers], axis=-1)  # (N, 4)
        level = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
        all_levels.append(level.astype(np.float32))
    return np.concatenate(all_levels, axis=0)


# ---------------------------------------------------------------------------
# IoU — on-device (vectorised; replaces the Cython kernel inside jit)
# ---------------------------------------------------------------------------


def iou_matrix(boxes: jax.Array, query_boxes: jax.Array) -> jax.Array:
    """Pairwise IoU between (N, 4) and (K, 4) xyxy boxes -> (N, K).

    On-device equivalent of the reference's Cython ``compute_overlap``
    (SURVEY.md SS2 "Native: IoU kernel"). Pure element-wise math; XLA fuses
    it into the surrounding program. Degenerate boxes yield IoU 0.
    """
    boxes = boxes.astype(jnp.float32)
    query_boxes = query_boxes.astype(jnp.float32)
    # Per-coordinate column form, NOT a stacked (N, K, 2) min/max: keeping
    # every intermediate (N, K)-shaped and derived from (N, 1)/(1, K)
    # columns lets XLA fuse the entire IoU into its consuming reduction.
    # The stacked form materialised a f32 (B, A, G, 2) corner tensor
    # (~5 GB accessed per D0/b128 train step, device trace) because the
    # trailing slice-multiply could not fuse into the argmax.
    ax1, ay1, ax2, ay2 = (boxes[:, i][:, None] for i in range(4))
    bx1, by1, bx2, by2 = (query_boxes[:, i][None, :] for i in range(4))
    iw = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    area_a = jnp.clip(ax2 - ax1, 0.0) * jnp.clip(ay2 - ay1, 0.0)  # (N, 1)
    area_b = jnp.clip(bx2 - bx1, 0.0) * jnp.clip(by2 - by1, 0.0)  # (1, K)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


# ---------------------------------------------------------------------------
# Box encode / decode
# ---------------------------------------------------------------------------


def encode_boxes(gt_boxes: jax.Array, anchors: jax.Array) -> jax.Array:
    """GT corners -> normalised regression targets (reference bbox_transform)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    t = jnp.stack(
        [
            (gt_boxes[..., 0] - anchors[..., 0]) / aw,
            (gt_boxes[..., 1] - anchors[..., 1]) / ah,
            (gt_boxes[..., 2] - anchors[..., 2]) / aw,
            (gt_boxes[..., 3] - anchors[..., 3]) / ah,
        ],
        axis=-1,
    )
    mean = jnp.asarray(BOX_MEAN, t.dtype)
    std = jnp.asarray(BOX_STD, t.dtype)
    return (t - mean) / std


def decode_boxes(deltas: jax.Array, anchors: jax.Array) -> jax.Array:
    """Regression outputs -> boxes (reference RegressBoxes layer)."""
    deltas = deltas.astype(jnp.float32)
    mean = jnp.asarray(BOX_MEAN, jnp.float32)
    std = jnp.asarray(BOX_STD, jnp.float32)
    t = deltas * std + mean
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    return jnp.stack(
        [
            anchors[..., 0] + t[..., 0] * aw,
            anchors[..., 1] + t[..., 1] * ah,
            anchors[..., 2] + t[..., 2] * aw,
            anchors[..., 3] + t[..., 3] * ah,
        ],
        axis=-1,
    )


def clip_boxes(boxes: jax.Array, image_hw: Tuple[int, int]) -> jax.Array:
    """Clamp boxes to the image (reference ClipBoxes layer)."""
    h, w = image_hw
    x1 = jnp.clip(boxes[..., 0], 0, w - 1)
    y1 = jnp.clip(boxes[..., 1], 0, h - 1)
    x2 = jnp.clip(boxes[..., 2], 0, w - 1)
    y2 = jnp.clip(boxes[..., 3], 0, h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


# ---------------------------------------------------------------------------
# On-device anchor-target assignment (reference anchor_targets_bbox)
# ---------------------------------------------------------------------------


def anchor_targets_compact(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    positive_iou: float = 0.5,
    negative_iou: float = 0.4,
):
    """Assign targets to anchors for one image, fully on-device.

    Args:
      anchors: (A, 4) xyxy.
      gt_boxes: (G, 4) xyxy, padded with zeros; a row with ``gt_labels < 0``
        is padding and never matches.
      gt_labels: (G,) int32, -1 for padding.
      positive_iou / negative_iou: matching thresholds
        (SURVEY.md SS2 "Anchors": IoU>=0.5 pos, <0.4 neg, else ignore).

    Returns:
      cls_labels: (A,) int32 matched class per positive anchor, -1 elsewhere.
        The (A, C) one-hot the losses need is regenerated on the fly inside
        their fused elementwise chains (losses.focal_loss) — materialising it
        here would write + re-read a (B, A, C) tensor (~1.1 GB/step at
        D0/b64) for no information the integer label doesn't carry.
      box_targets: (A, 4) float32 encoded regression targets.
      anchor_state: (A,) float32 in {-1 ignore, 0 negative, 1 positive} —
        the reference's extra "state" channel, kept as a separate tensor.
    """
    valid = gt_labels >= 0  # (G,)
    ious = iou_matrix(anchors, gt_boxes)  # (A, G)
    ious = jnp.where(valid[None, :], ious, -1.0)
    best_gt = jnp.argmax(ious, axis=1)  # (A,)
    best_iou = jnp.max(ious, axis=1)  # (A,)

    positive = best_iou >= positive_iou
    ignore = (best_iou >= negative_iou) & ~positive
    anchor_state = jnp.where(positive, 1.0, jnp.where(ignore, -1.0, 0.0))

    # Select the matched GT row with a one-hot contraction instead of a
    # gather: (A,)-indexed row gathers into tiny (G, .) tables lower to
    # latency-bound scatter-gathers (22.5 ms/step at D0/b32, device trace);
    # the (A, G) @ (G, .) form is sub-ms MXU work. argmax yields exactly
    # one match per row, so the sums select single rows. The class label
    # rides the same contraction as a 5th payload column (+1 so padding
    # rows contribute 0, never a spurious class 0).
    g = gt_boxes.shape[0]
    sel = (
        best_gt[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    ).astype(jnp.float32)  # (A, G) one-hot of the matched GT
    payload = jnp.concatenate(
        [
            gt_boxes.astype(jnp.float32),
            (gt_labels + 1).astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # (G, 5)
    matched = sel @ payload  # (A, 5)
    matched_boxes = matched[:, :4]
    # round() guards against sub-ulp error if XLA lowers the f32 dot to a
    # split-bf16 MXU form (int32 cast truncates).
    matched_labels = jnp.round(matched[:, 4]).astype(jnp.int32) - 1  # (A,)
    cls_labels = jnp.where(positive, matched_labels, -1)
    box_targets = encode_boxes(matched_boxes, anchors)
    box_targets = jnp.where(positive[:, None], box_targets, 0.0)
    return cls_labels, box_targets, anchor_state


def anchor_targets(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    num_classes: int,
    positive_iou: float = 0.5,
    negative_iou: float = 0.4,
):
    """One-hot variant of :func:`anchor_targets_compact` (reference
    ``anchor_targets_bbox`` shape contract: (A, C) one-hot cls targets).

    The train step uses the compact form; this wrapper serves tests and any
    caller wanting the reference's exact tensor layout.
    """
    cls_labels, box_targets, anchor_state = anchor_targets_compact(
        anchors, gt_boxes, gt_labels, positive_iou, negative_iou
    )
    cls_targets = jax.nn.one_hot(
        jnp.where(cls_labels < 0, num_classes, cls_labels),
        num_classes + 1,
        dtype=jnp.float32,
    )[:, :num_classes]
    return cls_targets, box_targets, anchor_state


def anchor_targets_batch(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    num_classes: int,
    positive_iou: float = 0.5,
    negative_iou: float = 0.4,
):
    """vmap of :func:`anchor_targets` over a batch dimension."""
    fn = functools.partial(
        anchor_targets,
        num_classes=num_classes,
        positive_iou=positive_iou,
        negative_iou=negative_iou,
    )
    return jax.vmap(fn, in_axes=(None, 0, 0))(anchors, gt_boxes, gt_labels)


def anchor_targets_batch_compact(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    positive_iou: float = 0.5,
    negative_iou: float = 0.4,
):
    """vmap of :func:`anchor_targets_compact` over a batch dimension.

    Returns (cls_labels (B, A) int32, box_targets (B, A, 4),
    anchor_state (B, A)) — the train step's form; the one-hot never exists.
    """
    fn = functools.partial(
        anchor_targets_compact,
        positive_iou=positive_iou,
        negative_iou=negative_iou,
    )
    return jax.vmap(fn, in_axes=(None, 0, 0))(anchors, gt_boxes, gt_labels)
