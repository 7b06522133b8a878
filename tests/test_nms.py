"""Tests for the on-device per-class NMS (SURVEY.md SS7 hard part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientdet_tpu.anchors import clip_boxes, decode_boxes
from efficientdet_tpu.configs import EvalConfig
from efficientdet_tpu.ops.nms import (
    batched_filter_detections,
    batched_filter_from_logits,
    filter_detections,
    filter_detections_from_logits,
)


def reference_nms(boxes, scores, score_thr=0.01, iou_thr=0.5, max_det=100):
    """Numpy oracle: per-class sequential NMS then global top-k by score."""

    def iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ua = (
            (a[2] - a[0]) * (a[3] - a[1])
            + (b[2] - b[0]) * (b[3] - b[1])
            - inter
        )
        return inter / ua if ua > 0 else 0.0

    results = []
    num_classes = scores.shape[1]
    for c in range(num_classes):
        idx = np.argsort(-scores[:, c], kind="stable")
        kept = []
        for i in idx:
            if scores[i, c] <= score_thr:
                continue
            if any(iou(boxes[i], boxes[j]) > iou_thr for j in kept):
                continue
            kept.append(i)
        results += [(scores[i, c], c, tuple(boxes[i])) for i in kept]
    results.sort(key=lambda r: -r[0])
    return results[:max_det]


class TestFilterDetections:
    def test_simple_suppression(self):
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
        )
        # one class; overlapping pair -> keep higher score; distant box kept
        scores = jnp.asarray([[0.9], [0.8], [0.7]], jnp.float32)
        b, s, c, n = filter_detections(boxes, scores, max_detections=10,
                                       pre_nms_top_k=3)
        assert int(n) == 2
        np.testing.assert_allclose(np.asarray(s)[:2], [0.9, 0.7], atol=1e-6)
        np.testing.assert_allclose(np.asarray(b)[0], [0, 0, 10, 10])
        assert np.asarray(c)[2] == -1  # padding

    def test_per_class_independence(self):
        # Same overlapping boxes, different classes -> both kept.
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
        scores = jnp.asarray([[0.9, 0.0], [0.0, 0.8]], jnp.float32)
        _, s, c, n = filter_detections(boxes, scores, max_detections=10,
                                       pre_nms_top_k=4)
        assert int(n) == 2
        assert set(np.asarray(c)[:2].tolist()) == {0, 1}

    def test_score_threshold(self):
        boxes = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        scores = jnp.asarray([[0.005]], jnp.float32)
        _, _, _, n = filter_detections(boxes, scores)
        assert int(n) == 0

    def test_matches_numpy_oracle_random(self):
        rng = np.random.RandomState(42)
        num_boxes, num_classes = 60, 5
        xy = rng.uniform(0, 80, (num_boxes, 2))
        wh = rng.uniform(5, 40, (num_boxes, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0, 1, (num_boxes, num_classes)).astype(np.float32)
        scores = np.where(scores > 0.5, scores, 0.0)  # sparsify

        want = reference_nms(boxes, scores, max_det=40)
        b, s, c, n = filter_detections(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            max_detections=40,
            pre_nms_top_k=num_boxes * num_classes,
        )
        got_n = int(n)
        assert got_n == len(want)
        np.testing.assert_allclose(
            np.asarray(s)[:got_n], [w[0] for w in want], atol=1e-6
        )
        assert np.asarray(c)[:got_n].tolist() == [w[1] for w in want]
        np.testing.assert_allclose(
            np.asarray(b)[:got_n], [w[2] for w in want], atol=1e-5
        )

    def test_batched_and_jittable(self):
        rng = np.random.RandomState(0)
        boxes = jnp.asarray(rng.uniform(0, 50, (2, 30, 4)), jnp.float32)
        boxes = boxes.at[..., 2:].add(30.0)
        scores = jnp.asarray(rng.uniform(0, 1, (2, 30, 3)), jnp.float32)
        cfg = EvalConfig(max_detections=10, pre_nms_top_k=64)
        fn = jax.jit(lambda b, s: batched_filter_detections(b, s, cfg))
        db, ds, dc, dn = fn(boxes, scores)
        assert db.shape == (2, 10, 4)
        assert ds.shape == (2, 10)
        assert dc.shape == (2, 10)
        assert dn.shape == (2,)


class TestLogitSpaceVariant:
    """filter_detections_from_logits must equal decode-all + filter_detections."""

    def test_matches_decode_everything(self):
        rng = np.random.RandomState(3)
        A, C = 200, 7
        xy = rng.uniform(0, 100, (A, 2))
        anchors = jnp.asarray(
            np.concatenate([xy, xy + rng.uniform(10, 50, (A, 2))], -1),
            jnp.float32,
        )
        deltas = jnp.asarray(0.3 * rng.randn(A, 4), jnp.float32)
        logits = jnp.asarray(rng.randn(A, C) - 2.0, jnp.float32)

        boxes = clip_boxes(decode_boxes(deltas, anchors), (160, 160))
        scores = jax.nn.sigmoid(logits)
        b1, s1, c1, n1 = filter_detections(
            boxes, scores, max_detections=30, pre_nms_top_k=150
        )
        b2, s2, c2, n2 = filter_detections_from_logits(
            anchors, deltas, logits, (160, 160),
            max_detections=30, pre_nms_top_k=150,
        )
        assert int(n1) == int(n2)
        k = int(n1)
        np.testing.assert_allclose(np.asarray(s1)[:k], np.asarray(s2)[:k], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(c1)[:k], np.asarray(c2)[:k])
        np.testing.assert_allclose(np.asarray(b1)[:k], np.asarray(b2)[:k], atol=1e-4)

    def test_batched_jit(self):
        rng = np.random.RandomState(4)
        B, A, C = 3, 100, 5
        xy = rng.uniform(0, 80, (A, 2))
        anchors = jnp.asarray(
            np.concatenate([xy, xy + rng.uniform(10, 40, (A, 2))], -1), jnp.float32
        )
        deltas = jnp.asarray(0.2 * rng.randn(B, A, 4), jnp.float32)
        logits = jnp.asarray(rng.randn(B, A, C), jnp.float32)
        cfg = EvalConfig(max_detections=10, pre_nms_top_k=64)
        fn = jax.jit(
            lambda d, l: batched_filter_from_logits(anchors, d, l, (128, 128), cfg)
        )
        b, s, c, n = fn(deltas, logits)
        assert b.shape == (3, 10, 4) and n.shape == (3,)


class TestBatchedFromLogits:
    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_matches_per_image_reference(self):
        rng = np.random.RandomState(9)
        B, A, C = 3, 300, 6
        xy = rng.uniform(0, 100, (A, 2))
        anchors = jnp.asarray(
            np.concatenate([xy, xy + rng.uniform(10, 50, (A, 2))], -1), jnp.float32
        )
        deltas = jnp.asarray(0.2 * rng.randn(B, A, 4), jnp.float32)
        logits = jnp.asarray(rng.randn(B, A, C) - 1.0, jnp.float32)
        cfg = EvalConfig(max_detections=25, pre_nms_top_k=256)

        got = batched_filter_from_logits(
            anchors, deltas, logits, (160, 160), cfg, use_pallas=False
        )
        for i in range(B):
            want = filter_detections_from_logits(
                anchors, deltas[i], logits[i], (160, 160),
                cfg.score_threshold, cfg.nms_iou_threshold,
                cfg.max_detections, cfg.pre_nms_top_k,
            )
            assert int(got[3][i]) == int(want[3])
            n = int(want[3])
            np.testing.assert_allclose(
                np.asarray(got[1][i])[:n], np.asarray(want[1])[:n], atol=1e-6
            )
            np.testing.assert_array_equal(
                np.asarray(got[2][i])[:n], np.asarray(want[2])[:n]
            )
            np.testing.assert_allclose(
                np.asarray(got[0][i])[:n], np.asarray(want[0])[:n], atol=1e-4
            )


class TestPerLevelFrontEnd:
    """The pixel-prefilter per-level path must match the concat path exactly."""

    def test_matches_concat_path(self):
        from efficientdet_tpu.anchors import anchors_for_shape
        from efficientdet_tpu.configs import ModelConfig
        from efficientdet_tpu.ops.nms import batched_filter_from_level_logits

        cfg = ModelConfig.for_phi(0, num_classes=20)
        size = 128  # levels 16, 8, 4, 2, 1
        rng = np.random.RandomState(0)
        a_cell, C = 9, 20
        hw = [size // s for s in (8, 16, 32, 64, 128)]
        cls_levels = [
            jnp.asarray(2.0 * rng.randn(3, h, h, a_cell * C).astype(np.float32))
            for h in hw
        ]
        box_levels = [
            jnp.asarray(0.1 * rng.randn(3, h, h, a_cell * 4).astype(np.float32))
            for h in hw
        ]
        anchors = jnp.asarray(anchors_for_shape((size, size), cfg.anchor))
        cls_cat = jnp.concatenate([l.reshape(3, -1, C) for l in cls_levels], 1)
        box_cat = jnp.concatenate([l.reshape(3, -1, 4) for l in box_levels], 1)
        ec = EvalConfig(pre_nms_top_k=256, approx_anchor_prefilter=False)
        want = batched_filter_from_logits(
            anchors, box_cat, cls_cat, (size, size), ec, use_pallas=False
        )
        got = batched_filter_from_level_logits(
            anchors, box_levels, cls_levels, (size, size), ec, use_pallas=False
        )
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-5)

    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_pixel_prefilter_superset_guarantee(self):
        # Adversarial: many strong anchors concentrated on FEW pixels must
        # not evict weaker anchors elsewhere beyond the exact top-K set.
        from efficientdet_tpu.anchors import anchors_for_shape
        from efficientdet_tpu.configs import ModelConfig
        from efficientdet_tpu.ops.nms import batched_filter_from_level_logits

        cfg = ModelConfig.for_phi(0, num_classes=4)
        size = 128
        rng = np.random.RandomState(1)
        a_cell, C = 9, 4
        hw = [size // s for s in (8, 16, 32, 64, 128)]
        cls_levels = []
        for h in hw:
            t = -8.0 + 0.01 * rng.randn(2, h, h, a_cell * C).astype(np.float32)
            cls_levels.append(jnp.asarray(t))
        # hot pixels: all 9 anchors x all classes strong on 3 pixels of P3
        hot = np.asarray(cls_levels[0]).copy()
        hot[:, :2, :2, :] = 5.0 + rng.rand(2, 2, 2, a_cell * C)
        cls_levels[0] = jnp.asarray(hot)
        box_levels = [
            jnp.asarray(0.1 * rng.randn(2, h, h, a_cell * 4).astype(np.float32))
            for h in hw
        ]
        anchors = jnp.asarray(anchors_for_shape((size, size), cfg.anchor))
        cls_cat = jnp.concatenate([l.reshape(2, -1, C) for l in cls_levels], 1)
        box_cat = jnp.concatenate([l.reshape(2, -1, 4) for l in box_levels], 1)
        ec = EvalConfig(pre_nms_top_k=64, approx_anchor_prefilter=False)
        want = batched_filter_from_logits(
            anchors, box_cat, cls_cat, (size, size), ec, use_pallas=False
        )
        got = batched_filter_from_level_logits(
            anchors, box_levels, cls_levels, (size, size), ec, use_pallas=False
        )
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-5)


class TestAnchorMajorFrontEnd:
    """The kernel-contract front end must match the concat path exactly."""

    def test_matches_concat_path(self):
        from efficientdet_tpu.anchors import anchors_for_shape
        from efficientdet_tpu.configs import ModelConfig
        from efficientdet_tpu.ops.nms import (
            batched_filter_from_anchor_major_levels,
        )

        cfg = ModelConfig.for_phi(0, num_classes=20)
        size = 128
        rng = np.random.RandomState(0)
        B, A, C = 3, 9, 20
        hw = [(size // s) ** 2 for s in (8, 16, 32, 64, 128)]
        zs, amaxes, zbs, cls_cat, box_cat = [], [], [], [], []
        for n in hw:
            lg = jnp.asarray(2.0 * rng.randn(B, n, A, C).astype(np.float32))
            bx = jnp.asarray(0.1 * rng.randn(B, n, A, 4).astype(np.float32))
            # kernel contract (one buffer over all levels, see
            # ops/head_pallas.py): z rows are level-major (b*HW+p), planes
            # are anchors; amax_img is (B, A*HW) a-major per level
            zs.append(lg.transpose(2, 0, 1, 3).reshape(A, B * n, C))
            amaxes.append(lg.max(-1).transpose(0, 2, 1).reshape(B, A * n))
            zbs.append(bx.reshape(B * n, A * 4))
            cls_cat.append(lg.reshape(B, n * A, C))
            box_cat.append(bx.reshape(B, n * A, 4))
        cls_out = (
            jnp.concatenate(zs, 1),
            jnp.concatenate(amaxes, 1),
            tuple(hw),
        )
        box_out = (jnp.concatenate(zbs, 0), tuple(hw))
        anchors = jnp.asarray(anchors_for_shape((size, size), cfg.anchor))
        ec = EvalConfig(pre_nms_top_k=256, approx_anchor_prefilter=False)
        want = batched_filter_from_logits(
            anchors,
            jnp.concatenate(box_cat, 1),
            jnp.concatenate(cls_cat, 1),
            (size, size),
            ec,
            use_pallas=False,
        )
        got = batched_filter_from_anchor_major_levels(
            anchors, box_out, cls_out, (size, size), ec,
            use_pallas=False,
        )
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-5)


class TestExactVsFastEval:
    """EvalConfig.exact() vs the fast serving defaults (VERDICT r1 #5).

    The fast path's two approximations are (a) per_anchor_top_c=16 class cap
    and (b) approx_max_k anchor prefilter (exact-on-CPU). These tests pin
    down exactly when they diverge and that the eval CLI's exact preset does
    not."""

    def _make_anchors(self, n=100, size=256.0):
        rng = np.random.RandomState(0)
        centers = rng.uniform(32, size - 32, (n, 2))
        wh = rng.uniform(16, 48, (n, 2))
        a = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1)
        return jnp.asarray(a, jnp.float32)

    def test_exact_keeps_all_classes_of_one_hot_anchor(self):
        """Adversarial: ONE anchor with 25 hot classes. The fast cap (16)
        drops 9 of them; exact() keeps all 25."""
        A, C = 100, 30
        anchors = self._make_anchors(A)
        deltas = jnp.zeros((1, A, 4), jnp.float32)
        logits = np.full((1, A, C), -12.0, np.float32)
        # 25 distinct classes of anchor 0, descending logits, all > thr
        hot = 25
        logits[0, 0, :hot] = np.linspace(5.0, 2.0, hot)
        logits = jnp.asarray(logits)

        exact = batched_filter_from_logits(
            anchors, deltas, logits, (256, 256),
            EvalConfig.exact(C), use_pallas=False,
        )
        fast = batched_filter_from_logits(
            anchors, deltas, logits, (256, 256),
            EvalConfig(), use_pallas=False,
        )
        # per-class NMS never suppresses across classes -> all survive
        assert int(exact[3][0]) == hot
        assert int(fast[3][0]) == 16  # the documented cap
        # the detections exact mode adds are precisely the overflow classes
        exact_cls = set(np.asarray(exact[2][0])[: int(exact[3][0])].tolist())
        fast_cls = set(np.asarray(fast[2][0])[: int(fast[3][0])].tolist())
        assert fast_cls == set(range(16))
        assert exact_cls == set(range(hot))

    def test_fast_equals_exact_on_realistic_logits(self):
        """With <=16 hot classes per anchor (every real detection pattern)
        and near-tie scores across anchors, fast == exact bit-for-bit on
        CPU (approx_max_k lowers to an exact sort here)."""
        rng = np.random.RandomState(1)
        A, C, B = 200, 40, 2
        anchors = self._make_anchors(A)
        deltas = jnp.asarray(rng.uniform(-0.3, 0.3, (B, A, 4)), jnp.float32)
        logits = np.full((B, A, C), -10.0, np.float32)
        for b in range(B):
            hot_anchors = rng.choice(A, 40, replace=False)
            for a in hot_anchors:
                classes = rng.choice(C, rng.randint(1, 4), replace=False)
                # near-ties: scores drawn from a tight band
                logits[b, a, classes] = rng.uniform(1.0, 1.01, len(classes))
        logits = jnp.asarray(logits)

        exact = batched_filter_from_logits(
            anchors, deltas, logits, (256, 256),
            EvalConfig.exact(C), use_pallas=False,
        )
        fast = batched_filter_from_logits(
            anchors, deltas, logits, (256, 256),
            EvalConfig(), use_pallas=False,
        )
        assert np.array_equal(np.asarray(exact[3]), np.asarray(fast[3]))
        np.testing.assert_allclose(
            np.asarray(exact[0]), np.asarray(fast[0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(exact[1]), np.asarray(fast[1]), atol=1e-6
        )
        assert np.array_equal(np.asarray(exact[2]), np.asarray(fast[2]))
