"""Fused MBConv Pallas kernel vs the Flax folded block (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientdet_tpu.configs import EFFICIENTNET_B0_BLOCKS, BlockConfig
from efficientdet_tpu.models.efficientnet import MBConvBlock
from mbconv_pallas import fused_mbconv_s1

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (pytest -m '')


def folded_block(cfg, cin, cout, seed=0, size=32):
    block = MBConvBlock(
        config=cfg, input_filters=cin, output_filters=cout,
        strides=1, survival_prob=1.0, fuse_bn=True,
    )
    x0 = jnp.zeros((1, size, size, cin))
    variables = block.init(jax.random.PRNGKey(seed), x0)
    # randomize biases so folding matters
    variables = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1), a.shape),
        variables,
    )
    return block, variables


@pytest.mark.parametrize(
    "cfg,cin,cout,skip",
    [
        (EFFICIENTNET_B0_BLOCKS[0], 32, 16, False),  # stage1: no expand
        (EFFICIENTNET_B0_BLOCKS[1], 24, 24, True),   # stage2 s1: expand 6
        (BlockConfig(5, 1, 40, 40, 6, 1), 40, 40, True),  # 5x5 kernel
    ],
)
def test_matches_flax_block(cfg, cin, cout, skip):
    block, variables = folded_block(cfg, cin, cout)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, cin))
    want = block.apply(variables, x)
    got = fused_mbconv_s1(
        x, variables["params"], ksize=cfg.kernel_size, has_skip=skip,
        tile_h=16, interpret=True,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_bf16_matches_loosely():
    cfg = EFFICIENTNET_B0_BLOCKS[1]
    block = MBConvBlock(
        config=cfg, input_filters=24, output_filters=24,
        strides=1, survival_prob=1.0, fuse_bn=True, dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((1, 32, 32, 24), jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(0), x0)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 24), jnp.bfloat16)
    want = np.asarray(block.apply(variables, x), np.float32)
    got = np.asarray(
        fused_mbconv_s1(x, variables["params"], ksize=3, has_skip=True,
                        tile_h=16, interpret=True),
        np.float32,
    )
    np.testing.assert_allclose(got, want, atol=0.1, rtol=0.1)
