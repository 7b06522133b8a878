"""Tests for the micro-batching serving front-end."""

import threading

import jax
import jax.numpy as jnp
import numpy as np

from efficientdet_tpu.serve import BatchingPredictor

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (pytest -m '')


def tiny_model():
    import dataclasses

    from efficientdet_tpu.configs import ModelConfig
    from efficientdet_tpu.models.detector import EfficientDet

    cfg = dataclasses.replace(
        ModelConfig.for_phi(0, num_classes=4, image_size=128),
        bifpn_width=8,
        bifpn_depth=1,
        head_depth=1,
    )
    return EfficientDet(config=cfg)


class TestBatchingPredictor:
    def test_concurrent_submissions_batched(self):
        model = tiny_model()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
        )
        pred = BatchingPredictor(
            model, variables, batch_size=4, max_delay_ms=30.0
        )
        try:
            rng = np.random.RandomState(0)
            images = [
                rng.randint(0, 255, (100 + 10 * i, 140, 3), np.uint8)
                for i in range(6)
            ]
            futs = []
            threads = [
                threading.Thread(
                    target=lambda im=im: futs.append(pred.predict(im))
                )
                for im in images
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            results = [f.result(timeout=120) for f in futs]
            assert len(results) == 6
            for boxes, scores, classes in results:
                assert boxes.ndim == 2 and boxes.shape[1] == 4
                assert len(scores) == len(boxes) == len(classes)
                # scores sorted descending, classes valid
                if len(scores) > 1:
                    assert (np.diff(scores) <= 1e-6).all()
                assert (classes >= 0).all() and (classes < 4).all()
        finally:
            pred.close()

    def test_matches_direct_pipeline(self):
        from efficientdet_tpu.configs import EvalConfig
        from efficientdet_tpu.data.common import letterbox_hostside
        from efficientdet_tpu.models.detector import predict_pipeline

        model = tiny_model()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
        )
        img = np.random.RandomState(1).randint(0, 255, (90, 128, 3), np.uint8)
        ec = EvalConfig()
        pred = BatchingPredictor(
            model, variables, batch_size=2, max_delay_ms=1.0, eval_config=ec
        )
        try:
            boxes, scores, classes = pred.predict_sync(img, timeout=300)
        finally:
            pred.close()
        canvas, scale = letterbox_hostside(img, 128)
        b, s, c, n = predict_pipeline(
            model, variables, jnp.asarray(canvas[None]), ec
        )
        n = int(n[0])
        np.testing.assert_allclose(np.asarray(s[0])[:n], scores, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(b[0])[:n] / scale, boxes, atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(c[0])[:n], classes)
