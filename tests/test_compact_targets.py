"""Compact (integer-label) anchor targets == one-hot reference path.

The train step materialises no (B, A, C) one-hot tensor (see
anchors.anchor_targets_compact / losses.focal_loss); these tests pin the
compact path to the one-hot path bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from efficientdet_tpu.anchors import (
    anchor_targets,
    anchor_targets_batch,
    anchor_targets_batch_compact,
    anchor_targets_compact,
    anchors_for_shape,
)
from efficientdet_tpu.configs import AnchorConfig
from efficientdet_tpu.losses import focal_loss


def _fixture(seed=0, batch=3, g=7, num_classes=6, size=64):
    cfg = AnchorConfig()
    anchors = jnp.asarray(anchors_for_shape((size, size), cfg))
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, size - 8, (batch, g, 1))
    y1 = rng.uniform(0, size - 8, (batch, g, 1))
    w = rng.uniform(4, 32, (batch, g, 1))
    h = rng.uniform(4, 32, (batch, g, 1))
    boxes = np.concatenate([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)
    labels = rng.randint(0, num_classes, (batch, g)).astype(np.int32)
    labels[:, -2:] = -1  # padding rows
    return anchors, jnp.asarray(boxes), jnp.asarray(labels), num_classes


class TestCompactEqualsOneHot:
    def test_single_image(self):
        anchors, boxes, labels, c = _fixture()
        oh_cls, oh_box, oh_state = anchor_targets(anchors, boxes[0], labels[0], c)
        lb_cls, lb_box, lb_state = anchor_targets_compact(anchors, boxes[0], labels[0])
        np.testing.assert_array_equal(np.asarray(oh_state), np.asarray(lb_state))
        np.testing.assert_allclose(np.asarray(oh_box), np.asarray(lb_box), atol=1e-6)
        rebuilt = jax.nn.one_hot(
            jnp.where(lb_cls < 0, c, lb_cls), c + 1
        )[:, :c]
        np.testing.assert_array_equal(np.asarray(oh_cls), np.asarray(rebuilt))
        # positives carry a real class, everything else -1
        pos = np.asarray(lb_state) == 1.0
        lab = np.asarray(lb_cls)
        assert np.all(lab[pos] >= 0) and np.all(lab[~pos] == -1)

    def test_batched(self):
        anchors, boxes, labels, c = _fixture(seed=1)
        oh_cls, oh_box, oh_state = anchor_targets_batch(anchors, boxes, labels, c)
        lb_cls, lb_box, lb_state = anchor_targets_batch_compact(anchors, boxes, labels)
        np.testing.assert_array_equal(np.asarray(oh_state), np.asarray(lb_state))
        np.testing.assert_allclose(np.asarray(oh_box), np.asarray(lb_box), atol=1e-6)
        rebuilt = jax.nn.one_hot(jnp.where(lb_cls < 0, c, lb_cls), c + 1)[..., :c]
        np.testing.assert_array_equal(np.asarray(oh_cls), np.asarray(rebuilt))


class TestFocalLabelForm:
    def test_focal_labels_equals_onehot(self):
        anchors, boxes, labels, c = _fixture(seed=2)
        oh_cls, _, state = anchor_targets_batch(anchors, boxes, labels, c)
        lb_cls, _, state2 = anchor_targets_batch_compact(anchors, boxes, labels)
        rng = np.random.RandomState(3)
        logits = jnp.asarray(
            rng.randn(*oh_cls.shape).astype(np.float32) * 2.0
        )
        a = float(focal_loss(logits, oh_cls, state))
        b = float(focal_loss(logits, lb_cls, state2))
        assert abs(a - b) < 1e-6 * max(1.0, abs(a))

    def test_focal_labels_grad_equals_onehot(self):
        anchors, boxes, labels, c = _fixture(seed=4, batch=2, size=32)
        oh_cls, _, state = anchor_targets_batch(anchors, boxes, labels, c)
        lb_cls, _, _ = anchor_targets_batch_compact(anchors, boxes, labels)
        rng = np.random.RandomState(5)
        logits = jnp.asarray(rng.randn(*oh_cls.shape).astype(np.float32))
        g1 = jax.grad(lambda z: focal_loss(z, oh_cls, state))(logits)
        g2 = jax.grad(lambda z: focal_loss(z, lb_cls, state))(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-7)
