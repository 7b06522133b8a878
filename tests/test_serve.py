"""Tests for the micro-batching serving front-end.

Two groups: the end-to-end tests (slow tier — full-model jit) and the
concurrency-contract tests (fast tier — the device call is stubbed so
overload/shutdown/crash semantics are tested without a single compile;
VERDICT r2 next #7).
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from efficientdet_tpu.serve import BatchingPredictor, PredictorOverloaded

import pytest


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


def stub_predictor(batch_size=2, max_delay_ms=1.0, max_pending=None,
                   predict=None, bucket_batches=True):
    """A BatchingPredictor whose device call is a host-side stub.

    No jit compile ever runs: ``_predict`` is replaced before any request
    is submitted, so the concurrency contract (queueing, overload,
    shutdown, crash propagation) is exercised at full speed in the fast
    tier. The stub must be installed before the first ``predict()`` call —
    the collector only touches ``_predict`` when flushing a batch.
    """

    class _Cfg:
        image_size = 64

    class _FakeModel:
        config = _Cfg()

    pred = BatchingPredictor(
        _FakeModel(), variables={}, batch_size=batch_size,
        max_delay_ms=max_delay_ms, max_pending=max_pending,
        bucket_batches=bucket_batches,
    )

    def default_predict(variables, images):
        b = images.shape[0]
        boxes = np.tile(np.asarray([[1.0, 2.0, 30.0, 40.0]], np.float32),
                        (b, 100, 1)).reshape(b, 100, 4)
        scores = np.zeros((b, 100), np.float32)
        scores[:, 0] = 0.9
        classes = np.zeros((b, 100), np.int32)
        nvalid = np.ones((b,), np.int32)
        return boxes, scores, classes, nvalid

    pred._predict = predict or default_predict
    return pred


class TestBatchBuckets:
    """Fast-tier: partial micro-batches pad to the smallest power-of-two
    bucket (one cached XLA program each) instead of the full batch —
    measured on-chip, a lone request otherwise ships a full 25 MB padded
    b=32 canvas batch through the host->device link (DESIGN 6j)."""

    def _img(self):
        return np.zeros((48, 48, 3), np.uint8)

    def test_bucket_sizes(self):
        from efficientdet_tpu.serve import _bucket_sizes

        assert _bucket_sizes(32) == [1, 2, 4, 8, 16, 32]
        assert _bucket_sizes(8) == [1, 2, 4, 8]
        assert _bucket_sizes(6) == [1, 2, 4, 6]
        assert _bucket_sizes(1) == [1]

    def _shape_recording_predictor(self, **kw):
        shapes = []

        def predict(variables, images):
            b = images.shape[0]
            shapes.append(b)
            boxes = np.zeros((b, 100, 4), np.float32)
            scores = np.zeros((b, 100), np.float32)
            classes = np.zeros((b, 100), np.int32)
            nvalid = np.ones((b,), np.int32)
            return boxes, scores, classes, nvalid

        return stub_predictor(predict=predict, **kw), shapes

    def test_single_request_dispatches_bucket_one(self):
        pred, shapes = self._shape_recording_predictor(
            batch_size=8, max_delay_ms=0.0
        )
        try:
            pred.predict_sync(self._img(), timeout=10)
        finally:
            pred.close()
        assert shapes == [1]

    def test_partial_batch_rounds_up_to_next_bucket(self):
        # 3 requests collected into one flush must pad to 4, not 8
        pred, shapes = self._shape_recording_predictor(
            batch_size=8, max_delay_ms=200.0
        )
        try:
            futs = [pred.predict(self._img()) for _ in range(3)]
            for f in futs:
                f.result(timeout=10)
        finally:
            pred.close()
        assert set(shapes) <= {4}, shapes

    def test_bucketing_disabled_pads_to_full_batch(self):
        pred, shapes = self._shape_recording_predictor(
            batch_size=8, max_delay_ms=0.0, bucket_batches=False
        )
        try:
            pred.predict_sync(self._img(), timeout=10)
        finally:
            pred.close()
        assert shapes == [8]

    def test_queued_items_drained_after_deadline(self):
        """Requests already in the queue when the flush deadline expires
        must join the current batch (zero extra latency) instead of
        fragmenting into a follow-up flush."""
        import queue as _q

        pred, shapes = self._shape_recording_predictor(
            batch_size=8, max_delay_ms=0.0
        )
        entered = threading.Event()
        release = threading.Event()
        orig_flush = pred._flush

        def gated_flush(batch):
            entered.set()
            release.wait(5)
            orig_flush(batch)

        pred._flush = gated_flush
        try:
            # stall the dispatcher inside flush #1, pre-load 4 requests,
            # release: with max_delay 0 and WITHOUT the drain they would
            # fragment into 4 singleton flushes
            first = pred.predict(self._img())
            assert entered.wait(5)
            futs = [pred.predict(self._img()) for _ in range(4)]
            release.set()
            first.result(timeout=10)
            for f in futs:
                f.result(timeout=10)
        finally:
            pred.close()
        assert shapes == [1, 4], shapes

    def test_warmup_compiles_every_bucket(self):
        pred, shapes = self._shape_recording_predictor(
            batch_size=8, max_delay_ms=0.0
        )
        try:
            pred.warmup()
        finally:
            pred.close()
        assert shapes == [1, 2, 4, 8]


class TestConcurrencyContract:
    """Fast-tier: overload, shutdown-mid-flight, crash propagation."""

    def _img(self, seed=0):
        return np.random.RandomState(seed).randint(
            0, 255, (48, 64, 3), np.uint8
        )

    def test_overload_raises_and_recovers(self):
        started = threading.Event()
        release = threading.Event()

        def blocking_predict(variables, images):
            started.set()
            assert release.wait(timeout=30)
            b = images.shape[0]
            return (
                np.zeros((b, 100, 4), np.float32),
                np.zeros((b, 100), np.float32),
                np.zeros((b, 100), np.int32),
                np.zeros((b,), np.int32),
            )

        pred = stub_predictor(batch_size=1, max_delay_ms=0.0,
                              max_pending=2, predict=blocking_predict)
        try:
            f0 = pred.predict(self._img())   # dequeued by the collector,
            assert started.wait(timeout=30)  # now blocking on-device
            f1 = pred.predict(self._img(1))  # fills the bounded queue
            f2 = pred.predict(self._img(2))
            with pytest.raises(PredictorOverloaded):
                pred.predict(self._img(3))   # backpressure, not growth
            release.set()
            for f in (f0, f1, f2):
                f.result(timeout=30)
            # capacity freed: accepted again
            pred.predict(self._img(4)).result(timeout=30)
        finally:
            release.set()
            pred.close()

    def test_device_exception_propagates_and_worker_survives(self):
        calls = {"n": 0}

        def flaky_predict(variables, images):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ValueError("injected device error")
            b = images.shape[0]
            return (
                np.zeros((b, 100, 4), np.float32),
                np.zeros((b, 100), np.float32),
                np.zeros((b, 100), np.int32),
                np.zeros((b,), np.int32),
            )

        pred = stub_predictor(batch_size=1, predict=flaky_predict)
        try:
            with pytest.raises(ValueError, match="injected device error"):
                pred.predict(self._img()).result(timeout=30)
            # a device-side error fails THAT batch only; the collector and
            # the predictor stay up for subsequent traffic
            boxes, scores, classes = pred.predict(self._img(1)).result(
                timeout=30
            )
            assert boxes.shape[1] == 4
        finally:
            pred.close()

    def test_worker_crash_fails_pending_and_rejects_new(self):
        pred = stub_predictor(batch_size=1)

        def boom(batch):
            raise RuntimeError("host-side packing crash")

        pred._flush = boom  # crash OUTSIDE the per-batch error handling
        fut = pred.predict(self._img())
        with pytest.raises(RuntimeError, match="packing crash"):
            fut.result(timeout=30)
        # collector is gone: new requests are rejected loudly, not queued
        # into a void
        deadline = time.monotonic() + 30
        while pred._broken is None and time.monotonic() < deadline:
            time.sleep(0.01)
        with pytest.raises(RuntimeError, match="worker crashed"):
            pred.predict(self._img(1))
        pred.close()  # must not deadlock

    def test_close_with_inflight_resolves_everything(self):
        def slow_predict(variables, images):
            time.sleep(0.05)
            b = images.shape[0]
            return (
                np.zeros((b, 100, 4), np.float32),
                np.zeros((b, 100), np.float32),
                np.zeros((b, 100), np.int32),
                np.ones((b,), np.int32),
            )

        pred = stub_predictor(batch_size=2, max_delay_ms=1.0,
                              predict=slow_predict)
        futs = [pred.predict(self._img(i)) for i in range(8)]
        pred.close()
        # every pre-close future resolves — with a result (drained) or the
        # shutdown error (raced past the sentinel) — never a hang
        for f in futs:
            assert f.done(), "future left hanging after close()"
            if f.exception() is None:
                assert f.result()[0].shape[1] == 4
            else:
                assert "closed" in str(f.exception())

    def test_predict_after_close_raises(self):
        pred = stub_predictor()
        pred.close()
        with pytest.raises(RuntimeError, match="closed"):
            pred.predict(self._img())

    def test_fetch_error_isolated_to_its_batch(self):
        """A device error surfacing at result-fetch time (the pipelined
        path: np.asarray in the resolver) fails that batch only."""

        class BoomArray:
            def __array__(self, *a, **k):
                raise ValueError("fetch boom")

        calls = {"n": 0}

        def predict(variables, images):
            calls["n"] += 1
            b = images.shape[0]
            good = (
                np.zeros((b, 100, 4), np.float32),
                np.zeros((b, 100), np.float32),
                np.zeros((b, 100), np.int32),
                np.ones((b,), np.int32),
            )
            return (BoomArray(),) + good[1:] if calls["n"] == 1 else good

        pred = stub_predictor(batch_size=1, predict=predict)
        try:
            f0 = pred.predict(self._img())
            with pytest.raises(ValueError, match="fetch boom"):
                f0.result(timeout=30)
            # the pipeline keeps flowing: the NEXT batch resolves fine
            boxes, _, _ = pred.predict(self._img(1)).result(timeout=30)
            assert boxes.shape == (1, 4)
        finally:
            pred.close()

    def test_dispatch_overlaps_fetch(self):
        """The point of the pipeline: while batch N's results are being
        fetched (resolver blocked), batch N+1 must already be DISPATCHED
        (device call issued) rather than waiting behind the fetch."""
        dispatched = []
        fetch_gate = threading.Event()
        second_dispatched = threading.Event()

        class SlowFetch:
            def __init__(self, arr):
                self.arr = arr

            def __array__(self, *a, **k):
                # resolver blocks here until the test confirms overlap
                assert fetch_gate.wait(timeout=30)
                return self.arr

        def predict(variables, images):
            b = images.shape[0]
            dispatched.append(b)
            if len(dispatched) == 2:
                second_dispatched.set()
            return (
                SlowFetch(np.zeros((b, 100, 4), np.float32)),
                np.zeros((b, 100), np.float32),
                np.zeros((b, 100), np.int32),
                np.ones((b,), np.int32),
            )

        pred = stub_predictor(batch_size=1, max_delay_ms=0.0,
                              predict=predict)
        try:
            f0 = pred.predict(self._img(0))
            f1 = pred.predict(self._img(1))
            # batch 1 is stuck in fetch; batch 2's dispatch must still happen
            assert second_dispatched.wait(timeout=30), (
                "dispatcher serialised on the resolver's fetch"
            )
            assert not f0.done()  # fetch really was blocked the whole time
            fetch_gate.set()
            f0.result(timeout=30)
            f1.result(timeout=30)
        finally:
            fetch_gate.set()
            pred.close()


@pytest.mark.slow  # compile-heavy: full-tier only (pytest -m '')
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

    def test_from_artifact_matches_direct_pipeline(self, tmp_path):
        """Serving from a .edz artifact == the live fused predict path."""
        from efficientdet_tpu.configs import EvalConfig
        from efficientdet_tpu.data.common import letterbox_hostside
        from efficientdet_tpu.export import save_exported
        from efficientdet_tpu.models.detector import (
            fuse_for_inference,
            predict_pipeline,
        )

        model = tiny_model()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
        )
        path = str(tmp_path / "tiny.edz")
        ec = EvalConfig()
        save_exported(path, model, variables, batch_size=2, eval_config=ec)

        pred = BatchingPredictor.from_artifact(path, max_delay_ms=1.0)
        img = np.random.RandomState(1).randint(0, 255, (90, 128, 3), np.uint8)
        try:
            # geometry comes from the manifest, not caller flags
            assert pred.batch_size == 2 and pred.size == 128
            assert pred.manifest["model"]["phi"] == 0
            boxes, scores, classes = pred.predict_sync(img, timeout=300)
        finally:
            pred.close()

        fmodel, fvars = fuse_for_inference(model, variables)
        canvas, scale = letterbox_hostside(img, 128)
        b, s, c, n = predict_pipeline(
            fmodel, fvars, jnp.asarray(canvas[None]), ec
        )
        n = int(n[0])
        np.testing.assert_allclose(np.asarray(s[0])[:n], scores, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(b[0])[:n] / scale, boxes, atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(c[0])[:n], classes)


class TestHttpSurface:
    """The demo endpoint's error paths (VERDICT r3 next #8): oversized
    bodies must 413, undecodable bodies must 400 — not a raw 500
    traceback out of PIL — and CLI model flags must conflict with --edz
    instead of being silently dropped (ADVICE r3)."""

    def _serve(self, predictor, max_request_mb=0.001):
        from efficientdet_tpu.serve import make_http_server

        server = make_http_server(
            predictor, host="127.0.0.1", max_request_mb=max_request_mb
        )
        # burst hardening: the stdlib default backlog of 5 reset real
        # connections at 64 concurrent clients (DESIGN 6j)
        assert type(server).request_queue_size == 128
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server

    def _post(self, server, body, path="/predict"):
        import http.client

        conn = http.client.HTTPConnection(
            "127.0.0.1", server.server_address[1], timeout=30
        )
        conn.request("POST", path, body=body)
        resp = conn.getresponse()
        out = (resp.status, resp.read())
        conn.close()
        return out

    def test_oversized_body_is_413(self):
        pred = stub_predictor()
        server = self._serve(pred, max_request_mb=0.001)  # 1 kB bound
        try:
            status, _ = self._post(server, b"x" * 10_000)
            assert status == 413
        finally:
            server.shutdown()
            pred.close()

    def test_undecodable_body_is_400(self):
        pred = stub_predictor()
        server = self._serve(pred, max_request_mb=1.0)
        try:
            status, _ = self._post(server, b"definitely not a JPEG")
            assert status == 400
        finally:
            server.shutdown()
            pred.close()

    def test_wrong_path_is_404(self):
        pred = stub_predictor()
        server = self._serve(pred)
        try:
            status, _ = self._post(server, b"", path="/nope")
            assert status == 404
        finally:
            server.shutdown()
            pred.close()

    def test_predict_deadline_is_504_not_dead_connection(self):
        """A future TimeoutError out of predict_sync (e.g. a cold XLA
        compile ahead of this request) must answer 504 — uncaught it kills
        the handler thread and the client sees a connection closed with no
        status line (observed driving bench_serve --http on-chip)."""
        import io as _io

        from PIL import Image

        pred = stub_predictor()
        pred.predict_sync = lambda img, timeout=30.0: (_ for _ in ()).throw(
            TimeoutError("deadline")
        )
        server = self._serve(pred, max_request_mb=1.0)
        try:
            buf = _io.BytesIO()
            Image.fromarray(
                np.zeros((64, 64, 3), np.uint8)
            ).save(buf, format="PNG")
            status, _ = self._post(server, buf.getvalue())
            assert status == 504
        finally:
            server.shutdown()
            pred.close()

    def test_valid_png_roundtrips_detections(self):
        import io as _io
        import json as _json

        from PIL import Image

        pred = stub_predictor()  # default stub returns fixed detections
        server = self._serve(pred, max_request_mb=1.0)
        try:
            buf = _io.BytesIO()
            Image.fromarray(
                np.zeros((64, 64, 3), np.uint8)
            ).save(buf, format="PNG")
            status, body = self._post(server, buf.getvalue())
            assert status == 200
            out = _json.loads(body)
            assert "detections" in out
            for det in out["detections"]:
                assert set(det) == {"box", "score", "class"}
        finally:
            server.shutdown()
            pred.close()

    def test_edz_conflicts_with_model_flags(self, capsys):
        from efficientdet_tpu.serve import main

        with pytest.raises(SystemExit) as e:
            main(["--edz", "/tmp/whatever.edz", "--phi", "3"])
        assert e.value.code == 2  # argparse error, not a crash
        err = capsys.readouterr().err
        assert "--phi" in err and "artifact manifest" in err

    def test_edz_conflicts_with_checkpoint_flag(self, capsys):
        from efficientdet_tpu.serve import main

        with pytest.raises(SystemExit) as e:
            main(["--edz", "/tmp/whatever.edz", "--checkpoint", "/tmp/ck"])
        assert e.value.code == 2
        assert "--checkpoint" in capsys.readouterr().err
