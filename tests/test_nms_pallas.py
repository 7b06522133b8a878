"""Pallas suppression kernel vs the XLA fixpoint reference (interpret mode
on CPU; the same test runs compiled on a real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientdet_tpu.anchors import iou_matrix
from efficientdet_tpu.ops.nms import _fixpoint_suppress
from efficientdet_tpu.ops.nms_pallas import suppression_keep_mask


def xla_keep(boxes, classes, valid, thr=0.5):
    def one(b, c, v):
        ious = iou_matrix(b, b)
        same = c[:, None] == c[None, :]
        k = b.shape[0]
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        )
        sup = (ious > thr) & same & tri
        return _fixpoint_suppress(sup, v)

    return jax.vmap(one)(boxes, classes, valid)


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_fixpoint(seed):
    rng = np.random.RandomState(seed)
    B, K = 2, 256
    xy = rng.uniform(0, 200, (B, K, 2))
    wh = rng.uniform(10, 120, (B, K, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    # score-sorted by construction (suppression only depends on order)
    classes = jnp.asarray(rng.randint(0, 4, (B, K)), jnp.int32)
    valid = jnp.asarray(rng.rand(B, K) > 0.1)

    want = np.asarray(xla_keep(boxes, classes, valid))
    got = np.asarray(
        suppression_keep_mask(boxes, classes, valid, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_padding_to_row_tile():
    rng = np.random.RandomState(2)
    B, K = 1, 200  # not a multiple of 128 -> wrapper pads
    xy = rng.uniform(0, 100, (B, K, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + 50], -1), jnp.float32)
    classes = jnp.zeros((B, K), jnp.int32)
    valid = jnp.ones((B, K), bool)
    want = np.asarray(xla_keep(boxes, classes, valid))
    got = np.asarray(
        suppression_keep_mask(boxes, classes, valid, interpret=True)
    )
    assert got.shape == (B, K)
    np.testing.assert_array_equal(got, want)


def test_invalid_never_kept_or_suppressing():
    boxes = jnp.asarray(
        [[[0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10]]], jnp.float32
    )
    classes = jnp.zeros((1, 3), jnp.int32)
    valid = jnp.asarray([[False, True, True]])
    got = np.asarray(
        suppression_keep_mask(boxes, classes, valid, interpret=True)
    )
    # candidate 0 invalid -> cannot suppress 1; 1 suppresses 2
    np.testing.assert_array_equal(got[0], [False, True, False])
