"""TpuBatchNorm vs flax nn.BatchNorm: exact math, mixed-precision behavior.

The custom BN exists purely for TPU bandwidth (docs/DESIGN.md: flax's
f32-promoting BatchNorm made bf16 training 1.8x SLOWER than f32); its math
must stay bit-compatible-within-fp-tolerance with flax/Keras BN (reference
BatchNormalization momentum 0.99, eps 1e-3).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from efficientdet_tpu.models.normalization import TpuBatchNorm


def _pair(use_running_average):
    ours = TpuBatchNorm(
        use_running_average=use_running_average, momentum=0.9, epsilon=1e-3
    )
    flaxbn = nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,
        epsilon=1e-3,
        dtype=jnp.float32,
    )
    return ours, flaxbn


def _rand(shape, seed=0, scale=3.0, offset=1.5):
    rng = np.random.RandomState(seed)
    return jnp.asarray(offset + scale * rng.randn(*shape).astype(np.float32))


class TestAgainstFlax:
    def test_param_tree_identical(self):
        x = _rand((2, 4, 4, 8))
        ours, flaxbn = _pair(True)
        v1 = ours.init(jax.random.PRNGKey(0), x)
        v2 = flaxbn.init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(v1) == jax.tree.structure(v2)
        assert jax.tree.all(
            jax.tree.map(lambda a, b: a.shape == b.shape and a.dtype == b.dtype, v1, v2)
        )

    def test_eval_mode_matches(self):
        x = _rand((2, 6, 6, 16))
        ours, flaxbn = _pair(True)
        variables = flaxbn.init(jax.random.PRNGKey(0), x)
        # non-trivial stats/params
        variables = jax.tree.map(
            lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
            variables,
        )
        want = flaxbn.apply(variables, x)
        got = ours.apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_train_mode_output_and_stats_match(self):
        x = _rand((4, 8, 8, 12), seed=1)
        ours, flaxbn = _pair(False)
        variables = flaxbn.init(jax.random.PRNGKey(0), x)
        want, m1 = flaxbn.apply(variables, x, mutable=["batch_stats"])
        got, m2 = ours.apply(variables, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(m2["batch_stats"][k]),
                np.asarray(m1["batch_stats"][k]),
                atol=2e-5,
            )

    def test_gradients_match_flax(self):
        x = _rand((3, 5, 5, 8), seed=2)
        ours, flaxbn = _pair(False)
        variables = flaxbn.init(jax.random.PRNGKey(0), x)

        def loss(mod, params, xx):
            y, _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xx,
                mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(y))

        g1x = jax.grad(lambda xx: loss(flaxbn, variables["params"], xx))(x)
        g2x = jax.grad(lambda xx: loss(ours, variables["params"], xx))(x)
        np.testing.assert_allclose(np.asarray(g2x), np.asarray(g1x), atol=1e-4)
        g1p = jax.grad(lambda p: loss(flaxbn, p, x))(variables["params"])
        g2p = jax.grad(lambda p: loss(ours, p, x))(variables["params"])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            ),
            g2p,
            g1p,
        )


class TestMixedPrecision:
    def test_bf16_io_dtype_preserved(self):
        x = _rand((2, 4, 4, 8)).astype(jnp.bfloat16)
        ours, _ = _pair(False)
        variables = ours.init(jax.random.PRNGKey(0), x)
        y, mut = ours.apply(variables, x, mutable=["batch_stats"])
        assert y.dtype == jnp.bfloat16
        # stats stay f32
        assert mut["batch_stats"]["mean"].dtype == jnp.float32
        assert mut["batch_stats"]["var"].dtype == jnp.float32

    def test_bf16_close_to_f32(self):
        xf = _rand((4, 8, 8, 16), seed=3)
        ours, _ = _pair(False)
        variables = ours.init(jax.random.PRNGKey(0), xf)
        yf, mf = ours.apply(variables, xf, mutable=["batch_stats"])
        yb, mb = ours.apply(
            variables, xf.astype(jnp.bfloat16), mutable=["batch_stats"]
        )
        # normalised outputs are O(1); bf16 input quantisation ~1e-2 relative
        np.testing.assert_allclose(
            np.asarray(yb, np.float32), np.asarray(yf), atol=5e-2
        )
        # statistics accumulated in f32 from bf16 input stay tight
        np.testing.assert_allclose(
            np.asarray(mb["batch_stats"]["mean"]),
            np.asarray(mf["batch_stats"]["mean"]),
            atol=3e-2,
        )
