"""Interpret-mode parity for the packed-layout fused MBConv kernel.

The kernel lives in experiments/ (it is a perf experiment first; it is
promoted into the model only behind a measured win — see docs/DESIGN.md
§6i). These tests pin its math against the real flax
MBConvBlock(fuse_bn=True) on CPU so a refactor can't silently break the
on-chip experiment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiments.packed_mbconv_pallas import (
    BlockShape,
    flax_block,
    pack_params,
    pack_rp,
    pack_x,
    packed_mbconv,
    packed_mbconv_rp,
    rp_mask,
    unpack_rp,
    unpack_x,
    xla_packed_mbconv,
)

# Tiny power-of-two shapes: expand+skip (k3), no-expand (k3), k5 path.
CASES = [
    BlockShape("tiny_exp_skip", 2, 16, 8, 48, 8, 3, 2),
    BlockShape("tiny_noexp", 2, 16, 8, 8, 4, 3, 2),
    BlockShape("tiny_k5", 2, 8, 8, 24, 8, 5, 2),
]


@pytest.mark.parametrize("shape", CASES, ids=lambda s: s.name)
def test_packed_kernel_matches_flax_block(shape):
    params, flax_fwd = flax_block(shape, jnp.float32)
    packed = pack_params(params, shape, jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.normal(size=(shape.batch, shape.hw, shape.hw, shape.cin)),
        jnp.float32,
    )
    want = np.asarray(flax_fwd(params, x), np.float32)

    xp = pack_x(x)
    got_pallas = np.asarray(
        unpack_x(packed_mbconv(xp, packed, shape, interpret=True), shape.hw),
        np.float32,
    )
    np.testing.assert_allclose(got_pallas, want, rtol=2e-4, atol=2e-4)

    got_xla = np.asarray(
        unpack_x(jax.jit(
            lambda a, p: xla_packed_mbconv(a, p, shape)
        )(xp, packed), shape.hw),
        np.float32,
    )
    np.testing.assert_allclose(got_xla, want, rtol=2e-4, atol=2e-4)

    # v2 row-padded mask-free kernel.
    xrp = pack_rp(x)
    mask = rp_mask(shape.hw, jnp.float32)
    got_rp = np.asarray(
        unpack_rp(
            packed_mbconv_rp(xrp, mask, packed, shape, interpret=True),
            shape.hw,
        ),
        np.float32,
    )
    np.testing.assert_allclose(got_rp, want, rtol=2e-4, atol=2e-4)

    # Zero-gap invariant: the rp output's pad lanes must be exactly zero
    # (the next block's tap loop relies on it instead of wrap masks).
    out_full = np.asarray(packed_mbconv_rp(xrp, mask, packed, shape,
                                           interpret=True), np.float32)
    gaps = out_full * (1.0 - np.asarray(rp_mask(shape.hw, jnp.float32)))
    np.testing.assert_array_equal(gaps, np.zeros_like(gaps))


@pytest.mark.slow
def test_routed_chain_matches_flax_chain():
    """Full routed early-stage chain (pallas + xla2 stride-2 with fused
    NHWC exit + mid-chain nhwc blocks) == the flax block chain, exactly,
    in f32 interpret mode."""
    from experiments.packed_chain import (
        TINY_CHAIN,
        chain_pack_params,
        flax_chain,
        routed_chain,
    )

    spec = TINY_CHAIN
    params, flax_fwd, mods = flax_chain(spec, jnp.float32)
    packed_list = chain_pack_params(params, spec, jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.normal(size=(spec.batch, spec.hw, spec.hw, spec.cin)),
        jnp.float32,
    )
    want = np.asarray(flax_fwd(params, x), np.float32)
    for route in spec.routes:
        got = np.asarray(
            routed_chain(x, params, packed_list, spec, route, mods,
                         interpret=True),
            np.float32,
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=str(route))


def test_pack_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(unpack_x(pack_x(x), 8)), x)
