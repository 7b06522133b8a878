"""Sanitizer tier (SURVEY.md §5 "Race detection / sanitizers").

JAX's functional purity makes data races structurally absent; the sanitizer
surface here is numerics (``jax_debug_nans``) and index arithmetic
(``checkify`` bounds checks on the NMS gather/decomposition math, the one
place the framework hand-computes flat indices).

These run in the DEFAULT test tier: the functions under test are small
(losses, NMS front-ends — no full-model compiles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from efficientdet_tpu.anchors import anchors_for_shape
from efficientdet_tpu.configs import EvalConfig, ModelConfig


@pytest.fixture
def debug_nans():
    """Enable jax_debug_nans for one test (conftest default is off because
    several intentionally-masked lanes use -inf sentinels; these tests
    assert the MATH paths stay NaN-free even under the checker)."""
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


class TestDebugNans:
    def test_detection_loss_nan_free(self, debug_nans):
        from efficientdet_tpu.anchors import anchor_targets_batch_compact
        from efficientdet_tpu.losses import detection_loss

        rng = np.random.RandomState(0)
        anchors = jnp.asarray(
            anchors_for_shape((128, 128), ModelConfig.for_phi(0).anchor)
        )
        A = anchors.shape[0]
        gt_boxes = jnp.asarray([[[10.0, 10.0, 60.0, 60.0]]], jnp.float32)
        gt_labels = jnp.asarray([[1]], jnp.int32)
        cls_t, box_t, state_t = anchor_targets_batch_compact(
            anchors, gt_boxes, gt_labels, 0.5, 0.4
        )
        cls_logits = jnp.asarray(rng.randn(1, A, 4), jnp.float32)
        box_preds = jnp.asarray(0.1 * rng.randn(1, A, 4), jnp.float32)
        total, aux = jax.jit(detection_loss)(
            cls_logits, box_preds, cls_t, box_t, state_t
        )
        assert np.isfinite(float(total))

    def test_detection_loss_nan_free_zero_positives(self, debug_nans):
        """The degenerate no-GT batch: loss normalisation must not divide
        0/0 (the classic NaN source in focal-loss implementations)."""
        from efficientdet_tpu.anchors import anchor_targets_batch_compact
        from efficientdet_tpu.losses import detection_loss

        rng = np.random.RandomState(1)
        anchors = jnp.asarray(
            anchors_for_shape((128, 128), ModelConfig.for_phi(0).anchor)
        )
        A = anchors.shape[0]
        gt_boxes = jnp.zeros((1, 1, 4), jnp.float32)
        gt_labels = jnp.full((1, 1), -1, jnp.int32)  # all padding
        cls_t, box_t, state_t = anchor_targets_batch_compact(
            anchors, gt_boxes, gt_labels, 0.5, 0.4
        )
        cls_logits = jnp.asarray(rng.randn(1, A, 4), jnp.float32)
        box_preds = jnp.asarray(0.1 * rng.randn(1, A, 4), jnp.float32)
        total, _ = jax.jit(detection_loss)(
            cls_logits, box_preds, cls_t, box_t, state_t
        )
        assert np.isfinite(float(total))


def _anchor_major_inputs(size=128, B=2, C=8, seed=0):
    """Head-kernel-contract NMS inputs (see ops/head_pallas.py docstring)."""
    rng = np.random.RandomState(seed)
    A = 9
    hw = [(size // s) ** 2 for s in (8, 16, 32, 64, 128)]
    zs, amaxes, zbs = [], [], []
    for n in hw:
        lg = jnp.asarray(2.0 * rng.randn(B, n, A, C).astype(np.float32))
        bx = jnp.asarray(0.1 * rng.randn(B, n, A, 4).astype(np.float32))
        zs.append(lg.transpose(2, 0, 1, 3).reshape(A, B * n, C))
        amaxes.append(lg.max(-1).transpose(0, 2, 1).reshape(B, A * n))
        zbs.append(bx.reshape(B * n, A * 4))
    cls_out = (jnp.concatenate(zs, 1), jnp.concatenate(amaxes, 1), tuple(hw))
    box_out = (jnp.concatenate(zbs, 0), tuple(hw))
    anchors = jnp.asarray(
        anchors_for_shape((size, size), ModelConfig.for_phi(0).anchor)
    )
    return anchors, box_out, cls_out


class TestCheckifyNms:
    """checkify bounds checks over the NMS index arithmetic."""

    def test_single_image_nms_index_checks(self):
        """Full single-image NMS (pair selection + suppression while-loop +
        final gathers) under index + NaN checks, via the standalone spec
        implementation ``filter_detections`` — its selection/suppression
        index math structurally mirrors the production batched path, but
        its while-loop is unbatched, which checkify requires
        (checkify-of-vmap-of-while is unsupported;
        ``filter_detections_from_logits`` is now a batch-1 wrapper over the
        batched path, so it can no longer be the checkify target)."""
        from efficientdet_tpu.anchors import clip_boxes, decode_boxes
        from efficientdet_tpu.ops.nms import filter_detections

        rng = np.random.RandomState(0)
        size, C = 128, 8
        anchors = jnp.asarray(
            anchors_for_shape((size, size), ModelConfig.for_phi(0).anchor)
        )
        A = anchors.shape[0]
        deltas = jnp.asarray(0.1 * rng.randn(A, 4), jnp.float32)
        logits = jnp.asarray(2.0 * rng.randn(A, C), jnp.float32)

        def fn(a, d, l):
            boxes = clip_boxes(decode_boxes(d, a), (size, size))
            return filter_detections(
                boxes, jax.nn.sigmoid(l), pre_nms_top_k=256
            )

        checked = checkify.checkify(
            jax.jit(fn), errors=checkify.index_checks | checkify.nan_checks
        )
        err, out = checked(anchors, deltas, logits)
        err.throw()  # raises if any gather went out of bounds / NaN'd
        assert int(np.asarray(out[3])) <= 100

    def test_level_decomposition_index_checks(self):
        """The hand-computed flat indices of the anchor-major front-end
        (ops/nms.py level decomposition — VERDICT r1 #9's named target),
        exercised via the split-out candidate builder."""
        from efficientdet_tpu.ops.nms import anchor_major_candidates

        anchors, box_out, cls_out = _anchor_major_inputs()
        ec = EvalConfig(pre_nms_top_k=256, approx_anchor_prefilter=False)

        fn = lambda a, zb, z, amax: anchor_major_candidates(
            a, (zb, box_out[1]), (z, amax, cls_out[2]), (128, 128), ec
        )
        checked = checkify.checkify(
            jax.jit(fn), errors=checkify.index_checks
        )
        err, out = checked(anchors, box_out[0], cls_out[0], cls_out[1])
        err.throw()
        cand_logits, cand_boxes, num_classes = out
        assert np.isfinite(np.asarray(cand_boxes)).all()
        assert num_classes == 8
