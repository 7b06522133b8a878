"""Golden-model tests: param counts, feature shapes, head weight sharing
(SURVEY.md SS4 "Golden-model")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import efficientdet_tpu as ed
from efficientdet_tpu.models.bifpn import FusedNode


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def init_shapes(phi, image_size=128, num_classes=90, **kw):
    model, cfg = ed.build_efficientdet(
        phi, num_classes=num_classes, image_size=image_size, **kw
    )
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
    )
    return model, cfg, shapes


# Paper Table 2 param counts (BASELINE.md [P-memory]); ours must be within
# 3% (head differs only via num_classes=90 vs the paper's 90-class COCO
# convention in the reference lineage).
PAPER_PARAMS = {0: 3.9e6, 1: 6.6e6, 2: 8.1e6, 3: 12.0e6, 4: 20.7e6, 5: 33.7e6, 6: 51.9e6}


class TestParamCounts:
    @pytest.mark.parametrize("phi", [0, 1, 2, 3])
    def test_matches_paper(self, phi):
        _, _, shapes = init_shapes(phi)
        n = count_params(shapes["params"])
        want = PAPER_PARAMS[phi]
        assert abs(n - want) / want < 0.03, f"D{phi}: {n:,} vs paper {want:,.0f}"

    @pytest.mark.parametrize(
        "phi",
        [4, pytest.param(5, marks=pytest.mark.slow),
         pytest.param(6, marks=pytest.mark.slow)],
    )
    def test_matches_paper_large(self, phi):
        _, _, shapes = init_shapes(phi)
        n = count_params(shapes["params"])
        want = PAPER_PARAMS[phi]
        assert abs(n - want) / want < 0.03, f"D{phi}: {n:,} vs paper {want:,.0f}"

    def test_d0_exact_golden(self):
        # Frozen golden for regression detection (established at build time,
        # matches paper 3.9M).
        _, _, shapes = init_shapes(0)
        assert count_params(shapes["params"]) == 3_880_067

    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_d7_same_backbone_as_d6(self):
        _, _, s6 = init_shapes(6)
        _, _, s7 = init_shapes(7)
        assert count_params(s6["params"]) == count_params(s7["params"])


class TestForward:
    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_d0_output_shapes(self):
        model, cfg, _ = init_shapes(0, image_size=256)
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
        cls, box = model.apply(vars_, jnp.zeros((2, 256, 256, 3)))
        a = cfg.total_anchors(256)
        assert cls.shape == (2, a, 90)
        assert box.shape == (2, a, 4)

    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_prior_probability_init(self):
        # At init, classification sigmoid outputs should be ~0.01 everywhere.
        model, _, _ = init_shapes(0, image_size=128)
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        cls, _ = model.apply(vars_, 127.0 * jnp.ones((1, 128, 128, 3)))
        probs = jax.nn.sigmoid(cls)
        assert 0.001 < float(jnp.mean(probs)) < 0.05

    def test_deterministic(self, slim_d0):
        # shared session detector (full B0 backbone); jitted apply — the
        # form every production entry point uses
        model, _, vars_ = slim_d0
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3))
        ap = jax.jit(model.apply)
        c1, b1 = ap(vars_, x)
        c2, b2 = ap(vars_, x)
        assert bool(jnp.all(c1 == c2)) and bool(jnp.all(b1 == b2))

    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_train_mode_updates_batch_stats(self):
        model, _, _ = init_shapes(0, image_size=128)
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
        (_, _), mutated = model.apply(
            vars_, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        before = jax.tree.leaves(vars_["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )
        assert changed

    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_freeze_bn_keeps_batch_stats(self):
        model, cfg = ed.build_efficientdet(0, image_size=128, freeze_bn=True)
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
        (_, _), mutated = model.apply(
            vars_, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        before = jax.tree.leaves(vars_["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert all(
            np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )


class TestHeadSharing:
    def test_convs_shared_bns_per_level(self):
        _, cfg, shapes = init_shapes(0)
        head = shapes["params"]["class_net"]["net"]
        # depth conv modules + 1 final, shared across 5 levels.
        conv_names = [k for k in head if k.startswith("conv")]
        assert len(conv_names) == cfg.head_depth
        bn_names = [k for k in head if k.startswith("bn_")]
        assert len(bn_names) == 5 * cfg.head_depth  # per level x per depth

    def test_weighted_fusion_params_exist(self):
        _, _, shapes = init_shapes(0, weighted_bifpn=True)
        layer0 = shapes["params"]["bifpn"]["layer0"]
        assert "fusion_weights" in layer0["p6_td"]
        assert layer0["p4_out"]["fusion_weights"].shape == (3,)
        _, _, unweighted = init_shapes(0, weighted_bifpn=False)
        assert "fusion_weights" not in unweighted["params"]["bifpn"]["layer0"]["p6_td"]


class TestFusedNode:
    def test_fast_normalized_fusion_math(self):
        # w=relu(w), out = sum w_i x_i / (sum w + eps) before conv: check via
        # direct module with identity-ish conv is overkill; instead check the
        # fusion weight normalisation responds to weight change.
        node = FusedNode(features=8, num_inputs=2, weighted=True)
        x = [jnp.ones((1, 4, 4, 8)), jnp.zeros((1, 4, 4, 8))]
        vars_ = node.init(jax.random.PRNGKey(0), x)
        # doubling both weights must not change output (normalised).
        v2 = jax.tree.map(lambda a: a, vars_)
        v2["params"]["fusion_weights"] = vars_["params"]["fusion_weights"] * 2.0
        y1 = node.apply(vars_, x)
        y2 = node.apply(v2, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


class TestPerPhiDefaults:
    def test_weighted_bifpn_default_unweighted_for_d6_d7(self):
        """Reference lineage builds D6/D7 with UNWEIGHTED fusion (SURVEY.md
        §2 "BiFPN"); D0–D5 use fast-normalised weighted fusion."""
        from efficientdet_tpu.configs import ModelConfig

        for phi in range(8):
            cfg = ModelConfig.for_phi(phi, num_classes=8)
            assert cfg.weighted_bifpn == (phi < 6), (phi, cfg.weighted_bifpn)
        # explicit override still wins in both directions
        assert ModelConfig.for_phi(7, weighted_bifpn=True).weighted_bifpn
        assert not ModelConfig.for_phi(0, weighted_bifpn=False).weighted_bifpn
