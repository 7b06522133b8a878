"""BN folding: fused model must compute the same function (SURVEY.md SS7
hard part #4 — BN semantics are the classic silent-accuracy-killer)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientdet_tpu.configs import ModelConfig
from efficientdet_tpu.models.detector import EfficientDet, fuse_for_inference


def tiny_model(image_size=128):
    cfg = dataclasses.replace(
        ModelConfig.for_phi(0, num_classes=4, image_size=image_size),
        bifpn_width=16,
        bifpn_depth=2,
        head_depth=1,
    )
    return EfficientDet(config=cfg), cfg


def _randomize_stats(variables, rng):
    """Make BN stats non-trivial so folding is actually exercised."""

    def f(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        k = jax.random.fold_in(rng, hash(name) % (2**31))
        if name == "mean":
            return 0.5 * jax.random.normal(k, x.shape)
        if name == "var":
            return jnp.exp(0.3 * jax.random.normal(k, x.shape))
        return x

    bs = jax.tree_util.tree_map_with_path(f, variables["batch_stats"])
    # also non-unit scales/shifts
    def g(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        k = jax.random.fold_in(rng, hash(name + "p") % (2**31))
        if name in ("scale",):
            return 1.0 + 0.2 * jax.random.normal(k, x.shape)
        if name in ("bias",) and x.ndim == 1:
            return 0.1 * jax.random.normal(k, x.shape)
        return x

    params = jax.tree_util.tree_map_with_path(g, variables["params"])
    return {"params": params, "batch_stats": bs}


class TestFoldBn:
    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_fused_matches_unfused(self):
        model, cfg = tiny_model()
        x0 = jnp.zeros((1, 128, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), x0)
        variables = _randomize_stats(variables, jax.random.PRNGKey(7))

        fused_model, fused_vars = fuse_for_inference(model, variables)
        images = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))

        cls_a, box_a = model.apply(variables, images, train=False)
        cls_b, box_b = fused_model.apply(
            jax.tree.map(jnp.asarray, fused_vars), images, train=False
        )
        np.testing.assert_allclose(
            np.asarray(cls_a), np.asarray(cls_b), atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(box_a), np.asarray(box_b), atol=2e-4, rtol=1e-3
        )

    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_no_bn_survives(self):
        model, cfg = tiny_model()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        _, fused_vars = fuse_for_inference(model, variables)
        flat = jax.tree_util.tree_flatten_with_path(fused_vars["params"])[0]
        names = ["/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat]
        assert not any("stem_bn" in n or "depthwise_bn" in n for n in names)
        assert not any("bn" in n.split("/") for n in names)
        assert not any("/bn_l" in n for n in names)  # head BNs folded too
        # per-level pointwise copies exist
        assert any("class_net" in n and "pw_l0_d0" in n for n in names)
        assert any("class_net" in n and "pw_l4_d0" in n for n in names)
        # no batch_stats remain at all
        assert "batch_stats" not in fused_vars
        # fused model accepts the tree (structural compatibility)
        out = EfficientDet(config=cfg, fuse_bn=True).apply(
            jax.tree.map(jnp.asarray, fused_vars),
            jnp.zeros((1, 128, 128, 3)),
            train=False,
        )
        assert out[0].shape[-1] == 4
