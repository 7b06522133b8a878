"""End-to-end prediction pipeline tests (SURVEY.md SS4 Integration,
BASELINE.json config 1: D0 single-image CPU-runnable predict)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import efficientdet_tpu as ed
from efficientdet_tpu.configs import EvalConfig, ModelConfig
from efficientdet_tpu.models.detector import EfficientDet, make_predict_fn
from efficientdet_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    preprocess_image,
)
from efficientdet_tpu.parallel import make_mesh, make_sharded_predict_fn

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (pytest -m '')


def tiny_model(num_classes=4, image_size=128):
    cfg = dataclasses.replace(
        ModelConfig.for_phi(0, num_classes=num_classes, image_size=image_size),
        bifpn_width=16,
        bifpn_depth=1,
        head_depth=1,
    )
    return EfficientDet(config=cfg), cfg


class TestPreprocess:
    def test_aspect_preserving_pad(self):
        img = jnp.ones((100, 200, 3), jnp.uint8) * 255
        out, scale = preprocess_image(img, 128)
        assert out.shape == (128, 128, 3)
        assert abs(float(scale) - 128 / 200) < 1e-6
        # bottom rows beyond the resized 64px extent are zero padding
        np.testing.assert_allclose(np.asarray(out)[65:, :, :], 0.0)
        # top-left is normalised white
        want = (1.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        np.testing.assert_allclose(np.asarray(out)[0, 0], want, atol=1e-4)

    def test_square_noop_scale(self):
        img = jnp.zeros((256, 256, 3), jnp.uint8)
        out, scale = preprocess_image(img, 128)
        assert out.shape == (128, 128, 3)
        assert abs(float(scale) - 0.5) < 1e-6


class TestPredictEndToEnd:
    def test_shapes_and_validity(self):
        model, cfg = tiny_model()
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        predict = make_predict_fn(
            model, EvalConfig(max_detections=25, pre_nms_top_k=200)
        )
        images = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (2, 128, 128, 3)), jnp.uint8
        )
        boxes, scores, classes, n = predict(vars_, images)
        assert boxes.shape == (2, 25, 4)
        assert scores.shape == (2, 25)
        assert classes.shape == (2, 25)
        b = np.asarray(boxes)
        assert (b >= 0).all() and (b <= 127).all()  # clipped to image
        nv = np.asarray(n)
        for i in range(2):
            s = np.asarray(scores)[i]
            assert (s[: nv[i]] > 0.01).all()
            assert (s[nv[i]:] == -1).all()

    def test_sharded_predict_eight_devices(self):
        mesh = make_mesh()
        model, cfg = tiny_model()
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        vars_ = jax.device_put(
            vars_, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        predict = make_sharded_predict_fn(
            model, mesh, EvalConfig(max_detections=10, pre_nms_top_k=100)
        )
        images = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (8, 128, 128, 3)), jnp.uint8
        )
        boxes, scores, classes, n = predict(vars_, images)
        assert boxes.shape == (8, 10, 4)
        assert n.shape == (8,)

    def test_sharded_matches_unsharded(self):
        mesh = make_mesh()
        model, cfg = tiny_model()
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        images = jnp.asarray(
            np.random.RandomState(1).randint(0, 255, (8, 128, 128, 3)), jnp.uint8
        )
        cfg_eval = EvalConfig(max_detections=10, pre_nms_top_k=100)
        single = make_predict_fn(model, cfg_eval)
        b1, s1, c1, n1 = single(vars_, images)
        vars_r = jax.device_put(
            vars_, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        sharded = make_sharded_predict_fn(model, mesh, cfg_eval)
        b2, s2, c2, n2 = sharded(vars_r, images)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


class TestPerLevelPath:
    def _compare_front_ends(self, front_end, atol_scores=1e-6, atol_boxes=1e-4):
        model, cfg = tiny_model(num_classes=20)  # C > per_anchor_top_c=16
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        images = jnp.asarray(
            np.random.RandomState(2).randint(0, 255, (2, 128, 128, 3)), jnp.uint8
        )
        from efficientdet_tpu.models.detector import predict_pipeline

        ec = EvalConfig(max_detections=30, pre_nms_top_k=256)
        a = predict_pipeline(model, vars_, images, ec, front_end="concat")
        b = predict_pipeline(model, vars_, images, ec, front_end=front_end)
        np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
        for i in range(2):
            n = int(a[3][i])
            np.testing.assert_allclose(
                np.asarray(a[1][i])[:n], np.asarray(b[1][i])[:n], atol=1e-6
            )
            np.testing.assert_array_equal(
                np.asarray(a[2][i])[:n], np.asarray(b[2][i])[:n]
            )
            np.testing.assert_allclose(
                np.asarray(a[0][i])[:n], np.asarray(b[0][i])[:n],
                atol=atol_boxes
            )

    def test_pixel_gather_matches_concat(self):
        # The pixel-prefilter emits the same detection SET but breaks ties
        # (bit-identical logits from nearest-upsampled BiFPN pixels) in a
        # different candidate order, so compare tie-insensitively.
        model, cfg = tiny_model(num_classes=20)
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        images = jnp.asarray(
            np.random.RandomState(2).randint(0, 255, (2, 128, 128, 3)), jnp.uint8
        )
        from efficientdet_tpu.models.detector import predict_pipeline

        ec = EvalConfig(max_detections=30, pre_nms_top_k=256)
        a = predict_pipeline(model, vars_, images, ec, front_end="concat")
        b = predict_pipeline(model, vars_, images, ec, front_end="pixel_gather")
        np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
        for i in range(2):
            n = int(a[3][i])
            np.testing.assert_allclose(
                np.asarray(a[1][i])[:n], np.asarray(b[1][i])[:n], atol=1e-6
            )
        # Among bit-identical tied scores the surviving anchor is
        # order-dependent; box/class equality on untied inputs is covered
        # bit-exactly by tests/test_nms.py::TestPerLevelFrontEnd.

    def test_anchor_major_matches_concat(self):
        # The anchor-major front end computes the final pointwise as the
        # fused matmul kernel over the same params; scores match to fp
        # noise, and like pixel_gather its candidate order breaks ties
        # (bit-identical logits from nearest-upsampled BiFPN pixels)
        # differently, so box/class equality is asserted on untied inputs
        # in tests/test_nms.py::TestAnchorMajorFrontEnd instead.
        model, cfg = tiny_model(num_classes=20)
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        images = jnp.asarray(
            np.random.RandomState(2).randint(0, 255, (2, 128, 128, 3)), jnp.uint8
        )
        from efficientdet_tpu.models.detector import predict_pipeline

        ec = EvalConfig(max_detections=30, pre_nms_top_k=256)
        a = predict_pipeline(model, vars_, images, ec, front_end="concat")
        b = predict_pipeline(model, vars_, images, ec, front_end="anchor_major")
        np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
        for i in range(2):
            n = int(a[3][i])
            np.testing.assert_allclose(
                np.asarray(a[1][i])[:n], np.asarray(b[1][i])[:n], atol=1e-5
            )


class TestSpatialPredict:
    def test_matches_single_device(self):
        """Conv-grid (H-axis) sharding over the mesh — the long-context /
        context-parallel analog (SURVEY.md §5): GSPMD inserts halo
        exchanges at shard seams; detections must equal the unsharded
        pipeline exactly."""
        import dataclasses

        from efficientdet_tpu.models.detector import predict_pipeline
        from efficientdet_tpu.parallel import make_mesh, make_spatial_predict_fn

        cfg = dataclasses.replace(
            ModelConfig.for_phi(0, num_classes=8, image_size=128),
            bifpn_width=16,
            bifpn_depth=1,
            head_depth=1,
        )
        model = EfficientDet(config=cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
        )
        mesh = make_mesh()
        ec = EvalConfig(approx_anchor_prefilter=False)
        images = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (2, 128, 128, 3)),
            jnp.uint8,
        )
        sp = make_spatial_predict_fn(model, mesh, ec)
        repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        got = sp(jax.device_put(variables, repl), images)
        want = jax.jit(
            lambda v, im: predict_pipeline(model, v, im, ec, front_end="concat")
        )(variables, images)
        for name, a, b in zip(("boxes", "scores", "classes", "n"), got, want):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=1e-4, err_msg=name,
            )
