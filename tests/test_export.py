"""Serving-artifact export tests (utils/export.py).

The reference ships trained detectors as .h5 prediction models reloadable
without the training code (SURVEY.md §3.2); here the analog is a jax.export
StableHLO artifact with params baked in. These tests pin the contract:
round-trip through real serialized bytes, bit-identical detections, and no
dependence on the model-building code at load time.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientdet_tpu.configs import EvalConfig, ModelConfig
from efficientdet_tpu.models.detector import EfficientDet, predict_pipeline
from efficientdet_tpu.utils.export import (
    export_predictor,
    load_serving_fn,
    save_exported,
)


@pytest.fixture(scope="module")
def tiny(slim_d0):
    # the shared session detector (conftest): slim BiFPN/heads — export
    # tracing cost scales with module count and the contract under test
    # (serialize/deserialize/baked params) doesn't
    model, _, variables = slim_d0
    return model, variables


def _batch(b=2, size=128, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (b, size, size, 3)).astype(np.uint8)


class TestExportRoundTrip:
    def test_detections_match_live_pipeline(self, tiny, tmp_path):
        model, variables = tiny
        ec = EvalConfig(max_detections=20)
        exported = export_predictor(
            model, variables, eval_config=ec, batch_size=2
        )
        path = str(tmp_path / "d0_tiny.jaxexp")
        save_exported(exported, path)

        fn = load_serving_fn(path)
        images = _batch()
        got = fn(images)
        want = jax.jit(
            lambda im: predict_pipeline(model, variables, im, ec)
        )(images)
        for g, w, name in zip(got, want, ("boxes", "scores", "classes", "n")):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=name
            )

    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_load_needs_no_model_code(self, tiny, tmp_path):
        """The artifact rehydrates via jax.export.deserialize alone."""
        model, variables = tiny
        path = str(tmp_path / "art.jaxexp")
        save_exported(
            export_predictor(model, variables, batch_size=1), path
        )
        with open(path, "rb") as f:
            exported = jax.export.deserialize(f.read())
        assert exported.in_avals[0].shape == (1, 128, 128, 3)
        b, s, c, n = jax.jit(exported.call)(_batch(b=1))
        assert b.shape[0] == 1 and n.dtype == jnp.int32

    def test_batch_size_is_static(self, tiny):
        model, variables = tiny
        exported = export_predictor(model, variables, batch_size=2)
        with pytest.raises(ValueError):
            jax.jit(exported.call)(_batch(b=3))

    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_params_are_baked_in(self, tiny):
        """Different weights -> different serialized programs (constants,
        not arguments): the artifact is self-contained."""
        model, variables = tiny
        v2 = jax.tree.map(lambda x: x + 1e-2, variables)
        a = export_predictor(model, variables, batch_size=1).serialize()
        b = export_predictor(model, v2, batch_size=1).serialize()
        assert a != b

    @pytest.mark.slow  # compile-heavy: full-tier only
    def test_cli_writes_artifact(self, tmp_path):
        from efficientdet_tpu.utils.export import main

        out = str(tmp_path / "cli.jaxexp")
        main(
            [
                "--phi", "0", "--image-size", "128", "--num-classes", "4",
                "--batch-size", "1", "--dtype", "f32", "--output", out,
            ]
        )
        fn = load_serving_fn(out)
        boxes, scores, classes, n = fn(_batch(b=1))
        assert boxes.shape == (1, 100, 4)
