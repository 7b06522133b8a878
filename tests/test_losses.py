"""Hand-computed value tests for focal and smooth-L1 losses (SURVEY.md SS4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from efficientdet_tpu.losses import detection_loss, focal_loss, smooth_l1_loss


def sigmoid(x):
    return 1.0 / (1.0 + math.exp(-x))


class TestFocal:
    def test_single_positive_hand_value(self):
        logit = 0.7
        p = sigmoid(logit)
        # target 1: loss = alpha * (1-p)^gamma * -log(p)
        want = 0.25 * (1 - p) ** 2 * -math.log(p)
        logits = jnp.full((1, 1, 1), logit)
        targets = jnp.ones((1, 1, 1))
        state = jnp.ones((1, 1))
        got = float(focal_loss(logits, targets, state))
        assert abs(got - want) < 1e-5

    def test_single_negative_hand_value(self):
        logit = -1.3
        p = sigmoid(logit)
        # target 0: loss = (1-alpha) * p^gamma * -log(1-p); normaliser 1 (no pos)
        want = 0.75 * p ** 2 * -math.log(1 - p)
        logits = jnp.full((1, 1, 1), logit)
        targets = jnp.zeros((1, 1, 1))
        state = jnp.zeros((1, 1))
        got = float(focal_loss(logits, targets, state))
        assert abs(got - want) < 1e-5

    def test_ignored_anchor_contributes_nothing(self):
        logits = jnp.asarray([[[5.0], [5.0]]])
        targets = jnp.zeros((1, 2, 1))
        state_all = jnp.asarray([[0.0, 0.0]])
        state_ignored = jnp.asarray([[0.0, -1.0]])
        full = float(focal_loss(logits, targets, state_all))
        half = float(focal_loss(logits, targets, state_ignored))
        assert abs(full - 2 * half) < 1e-6

    def test_normalized_by_num_positives(self):
        # 2 positives, identical anchors -> same per-anchor loss as 1 positive.
        logits = jnp.full((1, 2, 1), 0.3)
        targets = jnp.ones((1, 2, 1))
        state = jnp.ones((1, 2))
        two = float(focal_loss(logits, targets, state))
        one = float(
            focal_loss(logits[:, :1], targets[:, :1], state[:, :1])
        )
        assert abs(two - one) < 1e-6


class TestBatchGlobalNormalization:
    """Reference semantics (keras-retinanet lineage): ONE normaliser = the
    batch-total positive count, NOT a per-image mean — an image with a
    single object must not be up-weighted 9x against one with nine."""

    def test_focal_uneven_positives_across_batch(self):
        logit, c = 0.3, 1
        p = sigmoid(logit)
        per_anchor = 0.25 * (1 - p) ** 2 * -math.log(p)
        # image 0: 1 positive anchor; image 1: 9 positive anchors
        a = 9
        logits = jnp.full((2, a, c), logit)
        targets = jnp.ones((2, a, c))
        state = jnp.stack([
            jnp.asarray([1.0] + [-1.0] * (a - 1)),  # 1 pos, rest ignored
            jnp.ones((a,)),                          # 9 pos
        ])
        got = float(focal_loss(logits, targets, state))
        want = (1 + 9) * per_anchor / 10.0  # sum / total positives
        assert abs(got - want) < 1e-6
        # per-image-mean semantics would give mean(1*L/1, 9*L/9) = L
        assert abs(got - per_anchor) > 1e-3 or abs(want - per_anchor) < 1e-9

    def test_smooth_l1_uneven_positives_across_batch(self):
        d = 2.0
        per_anchor = (d - 0.5 / 9.0) * 4
        preds = jnp.full((2, 3, 4), d)
        targets = jnp.zeros((2, 3, 4))
        state = jnp.stack([
            jnp.asarray([1.0, 0.0, 0.0]),  # 1 positive
            jnp.asarray([1.0, 1.0, 1.0]),  # 3 positives
        ])
        got = float(smooth_l1_loss(preds, targets, state))
        assert abs(got - 4 * per_anchor / 4.0) < 1e-5  # sum/total, not mean


class TestSmoothL1:
    def test_quadratic_region(self):
        sigma = 3.0
        d = 0.05  # < 1/sigma^2 = 0.111
        want = 0.5 * sigma ** 2 * d ** 2 * 4  # 4 coords, 1 positive anchor
        preds = jnp.full((1, 1, 4), d)
        targets = jnp.zeros((1, 1, 4))
        state = jnp.ones((1, 1))
        got = float(smooth_l1_loss(preds, targets, state, sigma=sigma))
        assert abs(got - want) < 1e-5

    def test_linear_region(self):
        sigma = 3.0
        d = 2.0
        want = (d - 0.5 / sigma ** 2) * 4
        preds = jnp.full((1, 1, 4), d)
        targets = jnp.zeros((1, 1, 4))
        state = jnp.ones((1, 1))
        got = float(smooth_l1_loss(preds, targets, state, sigma=sigma))
        assert abs(got - want) < 1e-5

    def test_only_positive_anchors_count(self):
        preds = jnp.ones((1, 2, 4)) * 5.0
        targets = jnp.zeros((1, 2, 4))
        state = jnp.asarray([[1.0, 0.0]])  # second anchor negative
        got = float(smooth_l1_loss(preds, targets, state))
        state2 = jnp.asarray([[1.0, -1.0]])  # or ignored
        got2 = float(smooth_l1_loss(preds, targets, state2))
        assert abs(got - got2) < 1e-6


def test_detection_loss_composes():
    logits = jnp.zeros((2, 3, 4))
    box = jnp.zeros((2, 3, 4))
    cls_t = jnp.zeros((2, 3, 4))
    box_t = jnp.zeros((2, 3, 4))
    state = jnp.zeros((2, 3))
    total, aux = detection_loss(logits, box, cls_t, box_t, state)
    assert float(total) == float(aux["cls_loss"]) + float(aux["box_loss"])
    assert np.isfinite(float(total))


class TestFocalCustomVjp:
    """_focal_sum's hand-written backward vs autodiff of its own forward,
    including extreme logits (softplus/pow saturation regions)."""

    def test_grad_matches_autodiff_incl_extremes(self):
        from efficientdet_tpu.losses import _focal_elementwise, _focal_sum

        rng = np.random.RandomState(0)
        b, a, c = 2, 64, 7
        x = rng.randn(b, a, c).astype(np.float32) * 4.0
        # saturate corners: +-30 logits on both matched and unmatched classes
        x[0, 0, :] = 30.0
        x[0, 1, :] = -30.0
        x[1, 0, 0] = 30.0
        x[1, 0, 1] = -30.0
        labels = rng.randint(-1, c, (b, a)).astype(np.int32)
        labels[0, 0] = 0
        labels[0, 1] = 0
        include = (rng.rand(b, a) > 0.2).astype(np.float32)

        def via_custom(x):
            return jnp.sum(
                _focal_sum(x, jnp.asarray(labels), jnp.asarray(include),
                           0.25, 2.0)
            )

        def via_autodiff(x):
            f = _focal_elementwise(x, jnp.asarray(labels), 0.25, 2.0)
            return jnp.sum(jnp.sum(f, axis=-1) * include)

        g1 = jax.grad(via_custom)(jnp.asarray(x))
        g2 = jax.grad(via_autodiff)(jnp.asarray(x))
        assert np.all(np.isfinite(np.asarray(g1)))
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6
        )


class TestPerLevelLoss:
    """detection_loss_from_levels == detection_loss on the concat tensors."""

    def _make(self, seed=0, bsz=2, num_anchors=9, num_classes=6):
        rng = np.random.RandomState(seed)
        hw = [(8, 8), (4, 4), (2, 2)]
        cls_levels, box_levels = [], []
        for h, w in hw:
            cls_levels.append(jnp.asarray(
                rng.randn(bsz, h, w, num_anchors * num_classes), jnp.float32
            ))
            box_levels.append(jnp.asarray(
                rng.randn(bsz, h, w, num_anchors * 4), jnp.float32
            ))
        a_total = sum(h * w * num_anchors for h, w in hw)
        cls_t = jnp.asarray(
            rng.randint(-1, num_classes, (bsz, a_total)), jnp.int32
        )
        box_t = jnp.asarray(rng.randn(bsz, a_total, 4), jnp.float32)
        state = jnp.asarray(
            rng.choice([-1.0, 0.0, 1.0], (bsz, a_total), p=[0.1, 0.8, 0.1]),
            jnp.float32,
        )
        return cls_levels, box_levels, cls_t, box_t, state, num_anchors, num_classes

    @staticmethod
    def _concat(levels, num_anchors, out):
        bsz = levels[0].shape[0]
        return jnp.concatenate(
            [l.reshape(bsz, -1, out) for l in levels], axis=1
        )

    def test_matches_concat_path(self):
        from efficientdet_tpu.losses import (
            detection_loss,
            detection_loss_from_levels,
        )

        cls_l, box_l, cls_t, box_t, state, A, C = self._make()
        want, waux = detection_loss(
            self._concat(cls_l, A, C), self._concat(box_l, A, 4),
            cls_t, box_t, state,
        )
        got, gaux = detection_loss_from_levels(
            cls_l, box_l, cls_t, box_t, state, num_anchors=A
        )
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        np.testing.assert_allclose(
            float(gaux["cls_loss"]), float(waux["cls_loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(gaux["box_loss"]), float(waux["box_loss"]), rtol=1e-5
        )

    def test_gradients_match_concat_path(self):
        from efficientdet_tpu.losses import (
            detection_loss,
            detection_loss_from_levels,
        )

        cls_l, box_l, cls_t, box_t, state, A, C = self._make(seed=1)

        def loss_levels(cls_l, box_l):
            return detection_loss_from_levels(
                cls_l, box_l, cls_t, box_t, state, num_anchors=A
            )[0]

        def loss_concat(cls_l, box_l):
            return detection_loss(
                self._concat(cls_l, A, C), self._concat(box_l, A, 4),
                cls_t, box_t, state,
            )[0]

        g1 = jax.grad(loss_levels, argnums=(0, 1))(cls_l, box_l)
        g2 = jax.grad(loss_concat, argnums=(0, 1))(cls_l, box_l)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    def test_no_positives(self):
        from efficientdet_tpu.losses import detection_loss_from_levels

        cls_l, box_l, cls_t, box_t, state, A, C = self._make(seed=2)
        state = jnp.zeros_like(state)  # all negative
        cls_t = jnp.full_like(cls_t, -1)
        total, aux = detection_loss_from_levels(
            cls_l, box_l, cls_t, box_t, state, num_anchors=A
        )
        assert np.isfinite(float(total))
        assert float(aux["box_loss"]) == 0.0
