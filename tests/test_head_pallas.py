"""Parity tests for the fused head-pointwise Pallas kernel."""

import jax
import jax.numpy as jnp
import numpy as np

from efficientdet_tpu.ops.head_pallas import (
    head_pointwise_anchor_major,
    head_pointwise_reference,
)


class TestHeadPointwise:
    def test_interpret_matches_reference(self):
        rng = np.random.RandomState(0)
        m, cin, a, out = 1024, 64, 9, 10
        x = jnp.asarray(rng.randn(m, cin).astype(np.float32))
        k = jnp.asarray(rng.randn(cin, a * out).astype(np.float32)) * 0.1
        b = jnp.asarray(rng.randn(a * out).astype(np.float32))
        z1, m1, n1 = head_pointwise_anchor_major(x, k, b, a, interpret=True)
        z2, m2, n2 = head_pointwise_reference(x, k, b, a)
        assert n1 == n2 == m
        np.testing.assert_allclose(
            np.asarray(z1[:, :m]), np.asarray(z2), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(m1[:, :m]), np.asarray(m2), rtol=1e-5, atol=1e-5
        )

    def test_padding_rows(self):
        rng = np.random.RandomState(1)
        m, cin, a, out = 700, 32, 9, 4  # m not a multiple of ROW_TILE
        x = jnp.asarray(rng.randn(m, cin).astype(np.float32))
        k = jnp.asarray(rng.randn(cin, a * out).astype(np.float32)) * 0.1
        b = jnp.zeros((a * out,), jnp.float32)
        z1, m1, n1 = head_pointwise_anchor_major(x, k, b, a, interpret=True)
        z2, m2, _ = head_pointwise_reference(x, k, b, a)
        assert n1 == m and z1.shape[1] % 512 == 0
        np.testing.assert_allclose(
            np.asarray(z1[:, :m]), np.asarray(z2), rtol=1e-5, atol=1e-5
        )

    def test_rowmax_equals_max_of_rows(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(512, 16).astype(np.float32))
        k = jnp.asarray(rng.randn(16, 18).astype(np.float32))
        b = jnp.asarray(rng.randn(18).astype(np.float32))
        z, mx, _ = head_pointwise_reference(x, k, b, 9)
        np.testing.assert_allclose(
            np.asarray(mx), np.asarray(jnp.max(z, -1)), atol=1e-6
        )
