"""Unit tests for anchors, IoU, and box encode/decode (SURVEY.md SS4 Unit)."""

import jax.numpy as jnp
import numpy as np
import pytest

from efficientdet_tpu.anchors import (
    anchor_targets,
    anchors_for_shape,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    iou_matrix,
)
from efficientdet_tpu.configs import AnchorConfig


def brute_force_iou(boxes, queries):
    """Numpy oracle mirroring the reference Cython compute_overlap."""
    out = np.zeros((len(boxes), len(queries)), np.float64)
    for i, b in enumerate(boxes):
        for j, q in enumerate(queries):
            ix = max(0.0, min(b[2], q[2]) - max(b[0], q[0]))
            iy = max(0.0, min(b[3], q[3]) - max(b[1], q[1]))
            inter = ix * iy
            ua = (
                (b[2] - b[0]) * (b[3] - b[1])
                + (q[2] - q[0]) * (q[3] - q[1])
                - inter
            )
            out[i, j] = inter / ua if ua > 0 else 0.0
    return out


class TestIoU:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        a = rng.uniform(0, 100, (20, 2))
        boxes = np.concatenate([a, a + rng.uniform(1, 50, (20, 2))], -1)
        b = rng.uniform(0, 100, (13, 2))
        queries = np.concatenate([b, b + rng.uniform(1, 50, (13, 2))], -1)
        got = np.asarray(iou_matrix(jnp.asarray(boxes), jnp.asarray(queries)))
        want = brute_force_iou(boxes, queries)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_identity_and_disjoint(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
        m = np.asarray(iou_matrix(boxes, boxes))
        np.testing.assert_allclose(np.diag(m), [1.0, 1.0], atol=1e-6)
        assert m[0, 1] == 0.0

    def test_degenerate_box_zero(self):
        boxes = jnp.asarray([[5, 5, 5, 5]], jnp.float32)
        queries = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        assert float(iou_matrix(boxes, queries)[0, 0]) == 0.0


class TestAnchors:
    def test_counts_512(self):
        # 9 * (64^2 + 32^2 + 16^2 + 8^2 + 4^2) = 49104 (SURVEY.md SS4).
        anchors = anchors_for_shape((512, 512))
        assert anchors.shape == (49104, 4)

    def test_counts_640(self):
        anchors = anchors_for_shape((640, 640))
        want = 9 * sum((640 // s) ** 2 for s in (8, 16, 32, 64, 128))
        assert anchors.shape == (want, 4)

    def test_first_cell_centered(self):
        anchors = anchors_for_shape((512, 512))
        # First anchor: level P3 (stride 8, size 32), ratio 1, scale 1 ->
        # 32x32 box centred at (4, 4).
        np.testing.assert_allclose(anchors[0], [-12, -12, 20, 20], atol=1e-4)

    def test_anchor_scale(self):
        cfg = AnchorConfig(anchor_scale=4.0)
        assert cfg.sizes == (32, 64, 128, 256, 512)
        cfg5 = AnchorConfig(anchor_scale=5.0)  # D7
        assert cfg5.sizes == (40, 80, 160, 320, 640)

    def test_ratios_preserve_area(self):
        anchors = anchors_for_shape((512, 512))
        first9 = np.asarray(anchors[:9])
        w = first9[:, 2] - first9[:, 0]
        h = first9[:, 3] - first9[:, 1]
        # scales tile fastest within each ratio triplet
        areas = w * h
        want = np.tile(32.0 ** 2 * np.array([1, 2 ** (2 / 3), 2 ** (4 / 3)]), 3)
        np.testing.assert_allclose(areas, want, rtol=1e-4)
        # ratio = h/w pattern: 1,1,1, 0.5,0.5,0.5, 2,2,2
        np.testing.assert_allclose(h / w, np.repeat([1.0, 0.5, 2.0], 3), rtol=1e-4)


class TestEncodeDecode:
    def test_roundtrip(self):
        rng = np.random.RandomState(1)
        anchors = jnp.asarray(
            np.concatenate(
                [rng.uniform(0, 50, (30, 2)), rng.uniform(60, 120, (30, 2))], -1
            ),
            jnp.float32,
        )
        gt = jnp.asarray(
            np.concatenate(
                [rng.uniform(0, 50, (30, 2)), rng.uniform(60, 120, (30, 2))], -1
            ),
            jnp.float32,
        )
        deltas = encode_boxes(gt, anchors)
        back = decode_boxes(deltas, anchors)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)

    def test_zero_delta_is_anchor(self):
        anchors = jnp.asarray([[10, 10, 50, 50]], jnp.float32)
        out = decode_boxes(jnp.zeros((1, 4)), anchors)
        np.testing.assert_allclose(np.asarray(out), np.asarray(anchors), atol=1e-5)

    def test_clip(self):
        boxes = jnp.asarray([[-5, -5, 600, 600]], jnp.float32)
        out = np.asarray(clip_boxes(boxes, (512, 512)))
        np.testing.assert_allclose(out, [[0, 0, 511, 511]])


class TestAnchorTargets:
    def test_basic_assignment(self):
        anchors = jnp.asarray(
            [[0, 0, 10, 10], [100, 100, 110, 110], [0, 0, 9, 9]], jnp.float32
        )
        gt = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
        labels = jnp.asarray([3, -1], jnp.int32)
        cls_t, box_t, state = anchor_targets(anchors, gt, labels, num_classes=5)
        state = np.asarray(state)
        assert state[0] == 1.0  # exact match -> positive
        assert state[1] == 0.0  # far away -> negative
        assert state[2] == 1.0  # IoU 81/100 = 0.81 -> positive
        cls_t = np.asarray(cls_t)
        np.testing.assert_allclose(cls_t[0], [0, 0, 0, 1, 0])
        np.testing.assert_allclose(cls_t[1], 0)
        # positive box target decodes back to the gt box
        decoded = decode_boxes(box_t[0:1], anchors[0:1])
        np.testing.assert_allclose(np.asarray(decoded)[0], [0, 0, 10, 10], atol=1e-4)

    def test_ignore_band(self):
        # IoU between 0.4 and 0.5 -> ignore (-1).
        anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        gt = jnp.asarray([[0, 0, 10, 4.5]], jnp.float32)  # IoU = 0.45
        labels = jnp.asarray([0], jnp.int32)
        _, _, state = anchor_targets(anchors, gt, labels, num_classes=2)
        assert float(state[0]) == -1.0

    def test_all_padding_gt(self):
        anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        gt = jnp.zeros((3, 4), jnp.float32)
        labels = jnp.full((3,), -1, jnp.int32)
        cls_t, _, state = anchor_targets(anchors, gt, labels, num_classes=2)
        assert float(state[0]) == 0.0
        np.testing.assert_allclose(np.asarray(cls_t), 0.0)
