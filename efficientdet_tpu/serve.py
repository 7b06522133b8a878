"""Batched serving front-end: production inference over the fused pipeline.

The reference repo's deployment story ends at ``inference.py`` (single-image
script, SURVEY.md SS2 "Inference demo"). A TPU earns its keep at batch size,
so this module adds the production-serving piece a user of the reference
would otherwise hand-roll:

* :class:`BatchingPredictor` — thread-safe PIPELINED micro-batching around
  ONE compiled predict program: concurrent callers submit single images; a
  dispatcher thread packs them into fixed-shape batches (padding partial
  ones) and asynchronously dispatches the fused on-device pipeline
  (normalise -> forward -> decode -> NMS); a resolver thread fetches
  results and resolves per-caller futures with boxes mapped back to
  original image coordinates. Device compute overlaps result transfer
  (``pipeline_depth``), a bounded queue sheds overload, and crash guards
  guarantee no caller ever hangs.
* ``python -m efficientdet_tpu.serve`` — a minimal stdlib HTTP endpoint
  (POST /predict with a JPEG/PNG body -> JSON detections) wired to it.

Static shapes rule: every request is letterboxed on the host to the model
resolution, so one XLA program serves all traffic.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np


class PredictorOverloaded(RuntimeError):
    """Raised by :meth:`BatchingPredictor.predict` when ``max_pending``
    requests are already queued — shed load or retry with backoff."""


def _bucket_sizes(batch_size: int) -> List[int]:
    """Static batch buckets: powers of two below ``batch_size``, plus
    ``batch_size`` itself (ascending).

    One XLA program is compiled per bucket (jit caches by shape), so a
    partial micro-batch is padded only up to the SMALLEST bucket that fits
    instead of the full batch. Measured motivation (v5e behind a host
    relay, D0@512 bf16): a full b=32 padded canvas batch is 25 MB of
    host->device traffic per flush, which dominates low-concurrency
    latency; a b=1 bucket ships 0.8 MB.
    """
    sizes = []
    b = 1
    while b < batch_size:
        sizes.append(b)
        b *= 2
    sizes.append(batch_size)
    return sizes


class BatchingPredictor:
    """Micro-batching wrapper over the jitted predict function.

    Args:
      model / variables: as returned by ``build_efficientdet`` + init (pass
        BN-folded variables for production speed, see ``fuse_for_inference``).
      batch_size: static batch of the single compiled program.
      max_delay_ms: how long the collector waits to fill a batch before
        flushing a partial one (padded to ``batch_size``).
      eval_config: detection filtering parameters.
      max_pending: backpressure bound — maximum images queued but not yet
        flushed to the device. ``predict`` raises :class:`PredictorOverloaded`
        instead of letting an unbounded queue absorb a traffic spike
        (None selects the default ``32 * batch_size``; pass 0 for
        unbounded).
      pipeline_depth: how many batches may be in flight on the device at
        once. JAX dispatch is asynchronous, so with depth 2 (default) the
        dispatcher enqueues batch N+1's compute while batch N's results
        stream back to the host — device compute overlaps device->host
        transfer + host-side unpacking instead of serialising on
        ``np.asarray``. Depth 1 restores strict one-at-a-time behaviour.
      bucket_batches: when True (default), partial micro-batches are padded
        only to the smallest power-of-two bucket that fits (one cached XLA
        program per bucket, see :func:`_bucket_sizes`) instead of always to
        ``batch_size`` — cutting host->device upload and compute for
        low-concurrency traffic. Call :meth:`warmup` to pre-compile the
        bucket programs; otherwise the first request at a new bucket size
        pays its XLA compile mid-traffic.
    """

    def __init__(
        self,
        model,
        variables,
        batch_size: int = 16,
        max_delay_ms: float = 5.0,
        eval_config=None,
        max_pending: Optional[int] = None,
        pipeline_depth: int = 2,
        bucket_batches: bool = True,
    ):
        import jax

        from efficientdet_tpu.configs import EvalConfig
        from efficientdet_tpu.models.detector import predict_pipeline

        self.model = model
        self.variables = variables
        self.manifest = None
        self.batch_size = batch_size
        self.max_delay = max_delay_ms / 1e3
        self.size = model.config.image_size
        ec = eval_config or EvalConfig()
        self._predict = jax.jit(
            lambda v, im: predict_pipeline(model, v, im, ec)
        )
        self._buckets = (
            _bucket_sizes(batch_size) if bucket_batches else [batch_size]
        )
        self._start_runtime(max_pending, pipeline_depth)

    @classmethod
    def from_artifact(
        cls,
        path: str,
        max_delay_ms: float = 5.0,
        max_pending: Optional[int] = None,
        pipeline_depth: int = 2,
    ) -> "BatchingPredictor":
        """Serve directly from a one-file ``.edz`` export artifact.

        The artifact (``efficientdet_tpu.export.save_exported``) carries the
        compiled predict program, its weights, and the eval config — no
        model build, checkpoint restore, or BN folding happens on the
        serving host, and ``batch_size`` / image size come from the
        manifest (the exported program's batch is static).
        """
        from efficientdet_tpu.export import load_exported

        predict, manifest = load_exported(path)
        if not manifest.get("preprocess", True):
            raise ValueError(
                "artifact was exported with preprocess=False; the serving "
                "path submits uint8 letterboxed canvases — re-export with "
                "preprocess=True"
            )
        self = cls.__new__(cls)
        self.model = None
        self.variables = None  # weights live inside the loaded closure
        self.manifest = manifest
        self.batch_size = int(manifest["batch_size"])
        self.max_delay = max_delay_ms / 1e3
        self.size = int(manifest["model"]["image_size"])
        self._predict = lambda _vars, images: predict(images)
        # the exported program's batch is static — no bucketing possible
        self._buckets = [self.batch_size]
        self._start_runtime(max_pending, pipeline_depth)
        return self

    def _start_runtime(self, max_pending, pipeline_depth):
        if max_pending is None:
            max_pending = 32 * self.batch_size
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_pending or 0)
        # dispatched-but-unfetched batches; its bound IS the pipeline depth
        self._inflight_q: "queue.Queue" = queue.Queue(
            maxsize=max(pipeline_depth, 1)
        )
        self._closed = False
        self._broken: Optional[BaseException] = None
        # batches dequeued but not yet resolved; the crash guards fail their
        # futures (they are in no queue, so the queue drains can't see them)
        self._dispatching: Optional[List] = None
        self._resolving: Optional[List] = None
        self._worker = threading.Thread(target=self._run_guarded, daemon=True)
        self._resolver = threading.Thread(
            target=self._resolve_guarded, daemon=True
        )
        self._worker.start()
        self._resolver.start()

    def predict(self, image: np.ndarray) -> Future:
        """Submit one (H, W, 3) RGB uint8 image; returns a Future.

        The future resolves to ``(boxes (N, 4) xyxy in input coords,
        scores (N,), classes (N,))`` with only valid detections included.
        Raises :class:`PredictorOverloaded` when ``max_pending`` images are
        already queued (caller should shed load / retry with backoff).
        """
        if self._closed:
            raise RuntimeError("predictor closed")
        if self._broken is not None:
            raise RuntimeError(
                "predictor worker crashed; no further requests accepted"
            ) from self._broken
        from efficientdet_tpu.data.common import letterbox_hostside

        canvas, scale = letterbox_hostside(image, self.size)
        fut: Future = Future()
        try:
            self._queue.put_nowait((canvas, scale, fut))
        except queue.Full:
            raise PredictorOverloaded(
                f"{self._queue.maxsize} images already pending"
            ) from None
        if self._broken is not None or (
            self._closed and not self._worker.is_alive()
        ):
            # raced past the closed/broken check while the corresponding
            # drain ran: the worker will never see this item — fail it
            # instead of hanging the caller
            self._fail_pending(
                self._broken or RuntimeError("predictor closed")
            )
        return fut

    def predict_sync(self, image: np.ndarray, timeout: Optional[float] = 30.0):
        """Blocking convenience wrapper around :meth:`predict`."""
        return self.predict(image).result(timeout=timeout)

    def warmup(self) -> None:
        """Compile and run every bucket program once, blocking until done.

        Without this, the first micro-batch that lands in a given bucket
        pays that bucket's XLA compile mid-traffic (multi-minute cold, and
        the request's deadline typically expires first — the HTTP surface
        answers 504). Call before accepting traffic; safe to call on a
        live predictor (the jit cache is shared with the dispatcher).
        """
        for b in self._buckets:
            out = self._predict(
                self.variables,
                np.zeros((b, self.size, self.size, 3), np.uint8),
            )
            for o in out:
                np.asarray(o)

    def close(self):
        """Stop accepting requests, drain in-flight ones, join the worker.

        Every future submitted before ``close`` resolves (result or error);
        any request racing past the closed check resolves with an error
        rather than hanging (the post-join drain below catches items the
        worker never saw).
        """
        self._closed = True
        try:
            # bounded put: if the worker crashed with a full queue, waiting
            # for a consumer that no longer exists would deadlock close()
            self._queue.put(None, timeout=5)
        except queue.Full:
            pass
        self._worker.join(timeout=60)
        self._resolver.join(timeout=60)
        exc = RuntimeError("predictor closed")
        self._fail_pending(exc)
        self._fail_inflight(exc)

    # -- dispatcher / resolver pipeline -----------------------------------
    #
    # Two stages connected by a bounded in-flight queue:
    #   dispatcher: request queue -> micro-batch -> pack -> self._predict
    #               (JAX enqueues the computation and returns immediately)
    #   resolver:   in-flight queue -> np.asarray (blocks until the device
    #               finishes + results land on the host) -> resolve futures
    # While the resolver waits on batch N's transfer, the dispatcher has
    # already queued batch N+1's compute, so the device never idles between
    # micro-batches. The in-flight queue bound is the pipeline depth.

    def _fail_pending(self, exc: BaseException) -> None:
        """Resolve every still-queued request future with ``exc``."""
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not None:
                item[2].set_exception(exc)

    def _fail_inflight(self, exc: BaseException) -> None:
        """Resolve every dispatched-but-unfetched future with ``exc``."""
        while True:
            try:
                item = self._inflight_q.get_nowait()
            except queue.Empty:
                return
            if item is not None:
                for _, _, fut in item[0]:
                    if not fut.done():
                        fut.set_exception(exc)

    @staticmethod
    def _fail_batch(batch, exc: BaseException) -> None:
        for _, _, fut in batch or []:
            if not fut.done():
                fut.set_exception(exc)

    def _run_guarded(self):
        """Dispatcher guard: a crash must fail callers, not hang them.

        ``_flush`` already routes dispatch-time errors into the batch's
        futures; this guard covers everything else (host-side packing,
        queue logic) — without it a single unexpected exception would kill
        the thread and leave every pending future unresolved forever.
        """
        try:
            self._run()
        except BaseException as e:  # noqa: BLE001 — must not lose callers
            self._broken = e
            self._fail_batch(self._dispatching, e)
            self._fail_pending(e)
        finally:
            # always hand the resolver its shutdown sentinel, crash or not
            try:
                self._inflight_q.put(None, timeout=5)
            except queue.Full:
                pass  # resolver crashed with a full pipeline; drains handle it

    def _resolve_guarded(self):
        try:
            self._resolve_loop()
        except BaseException as e:  # noqa: BLE001
            self._broken = e
            self._fail_batch(self._resolving, e)
            self._fail_inflight(e)

    def _run(self):
        while True:
            item = self._queue.get()
            if item is None:
                return
            batch: List[Tuple[np.ndarray, float, Future]] = [item]
            self._dispatching = batch  # guard visibility: same list object
            # fill up to batch_size, waiting at most max_delay
            import time

            deadline = time.monotonic() + self.max_delay
            while len(batch) < self.batch_size:
                remaining = deadline - time.monotonic()
                try:
                    if remaining <= 0:
                        # deadline passed: stop WAITING, but still drain
                        # requests already sitting in the queue — they
                        # cost zero extra latency and un-fragment the
                        # thundering herd a resolved batch's callers
                        # produce when they all resubmit at once
                        nxt = self._queue.get_nowait()
                    else:
                        nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(batch)
                    return
                batch.append(nxt)
            self._flush(batch)
            self._dispatching = None

    def _flush(self, batch):
        """Pack and DISPATCH one micro-batch (does not wait for results).

        Pads to the smallest batch bucket that fits (``self._buckets``) —
        at concurrency 1 that is a 1-image program instead of a full
        ``batch_size`` canvas batch shipped to the device per request.
        """
        bucket = next(s for s in self._buckets if s >= len(batch))
        images = np.zeros(
            (bucket, self.size, self.size, 3), np.uint8
        )
        for i, (canvas, _, _) in enumerate(batch):
            images[i] = canvas
        try:
            outputs = self._predict(self.variables, images)
        except Exception as e:  # dispatch-time error (tracing, shapes, OOM)
            self._fail_batch(batch, e)
            return
        # hand to the resolver; blocks only when `pipeline_depth` batches
        # are already in flight (that wait IS the pipeline backpressure).
        # Bounded waits so a dead resolver can't wedge the dispatcher.
        while True:
            if self._broken is not None:
                self._fail_batch(batch, self._broken)
                return
            try:
                self._inflight_q.put((batch, outputs), timeout=0.5)
            except queue.Full:
                continue
            if self._broken is not None:
                # resolver crashed between the check above and our put: its
                # drain may have already run, so nothing would ever consume
                # this batch — drain again (done futures are skipped)
                self._fail_inflight(self._broken)
            return

    def _resolve_loop(self):
        while True:
            item = self._inflight_q.get()
            if item is None:
                return
            batch, outputs = item
            self._resolving = batch
            try:
                # blocks until the device finishes this batch and the
                # results are on the host — the dispatcher keeps working
                boxes, scores, classes, nvalid = (
                    np.asarray(o) for o in outputs
                )
            except Exception as e:  # device-side error surfaces at fetch
                self._fail_batch(batch, e)
                self._resolving = None
                continue
            for i, (_, scale, fut) in enumerate(batch):
                if fut.done():  # caller cancelled: their loss, not a crash
                    continue
                n = int(nvalid[i])
                fut.set_result(
                    (
                        boxes[i, :n] / scale,  # back to input coordinates
                        scores[i, :n],
                        classes[i, :n],
                    )
                )
            self._resolving = None


def make_http_handler(predictor, max_request_mb: float = 32.0):
    """Build the stdlib request handler for ``main`` (factored out so the
    error paths — 404/413/400/503 — are testable without a model)."""
    import io
    import json
    from http.server import BaseHTTPRequestHandler

    max_request_bytes = int(max_request_mb * 1e6)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            if length > max_request_bytes:
                self.send_error(
                    413, f"request body exceeds {max_request_mb} MB"
                )
                return
            body = self.rfile.read(length)
            from PIL import Image

            try:
                img = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
            except Exception:
                # malformed/truncated body must be a 400, not a raw 500
                # traceback from inside PIL
                self.send_error(400, "body is not a decodable image")
                return
            try:
                boxes, scores, classes = predictor.predict_sync(img)
            except PredictorOverloaded:
                self.send_error(503, "overloaded: too many pending requests")
                return
            except TimeoutError:
                # future deadline expired (e.g. a cold XLA compile ahead of
                # this request): an uncaught raise here kills the handler
                # thread and the client sees a closed connection with NO
                # status line — answer 504 so it can back off and retry
                self.send_error(504, "predict deadline exceeded")
                return
            out = json.dumps(
                {
                    "detections": [
                        {
                            "box": [round(float(x), 2) for x in b],
                            "score": round(float(s), 4),
                            "class": int(c),
                        }
                        for b, s, c in zip(boxes, scores, classes)
                    ]
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):  # quiet
            pass

    return Handler


def make_http_server(predictor, host: str = "0.0.0.0", port: int = 0,
                     max_request_mb: float = 32.0):
    """ThreadingHTTPServer wired to the predictor, tuned for bursts.

    The stdlib default listen backlog (``request_queue_size = 5``) drops
    connections with ECONNRESET when more than a handful of clients
    connect in the same instant — measured driving 64 closed-loop clients
    over loopback (31 resets in a 10 s window). 128 covers any burst the
    bounded predictor queue would accept anyway (beyond it, requests get
    an orderly 503 from the overload path instead of a transport error).
    """
    from http.server import ThreadingHTTPServer

    class Server(ThreadingHTTPServer):
        daemon_threads = True
        request_queue_size = 128

    return Server((host, port), make_http_handler(predictor, max_request_mb))


def main(argv=None):
    """Minimal HTTP serving CLI: POST an image to /predict -> JSON."""
    import argparse

    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(description="Serve an EfficientDet model.")
    p.add_argument(
        "--edz",
        default=None,
        help="serve from a one-file .edz export artifact (export.py); "
        "--phi/--checkpoint/--num-classes/--batch-size/--score-threshold "
        "are then taken from the artifact manifest and ignored here",
    )
    p.add_argument("--phi", type=int, default=0, choices=range(8))
    p.add_argument("--checkpoint", default=None, help="orbax params dir")
    p.add_argument("--num-classes", type=int, default=90)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument(
        "--max-pending", type=int, default=None,
        help="request queue bound before 503 (default 32x batch)",
    )
    p.add_argument(
        "--pipeline-depth", type=int, default=2,
        help="dispatched-but-unfetched device batches (host/TPU overlap)",
    )
    p.add_argument(
        "--max-request-mb", type=float, default=32.0,
        help="reject request bodies larger than this with 413",
    )
    p.add_argument(
        "--no-bucket-batches", action="store_true",
        help="always pad partial micro-batches to the full --batch-size "
        "(one XLA program) instead of power-of-two buckets",
    )
    p.add_argument(
        "--skip-warmup", action="store_true",
        help="skip pre-compiling the bucket programs before accepting "
        "traffic (first request per bucket then pays its XLA compile)",
    )
    args = p.parse_args(argv)

    if args.edz:
        # The artifact manifest owns the model; a CLI model flag passed
        # alongside --edz would be silently ignored — make that an error
        # instead (check against parser defaults).
        ignored = [
            flag
            for flag, value, default in (
                ("--phi", args.phi, 0),
                ("--checkpoint", args.checkpoint, None),
                ("--num-classes", args.num_classes, 90),
                ("--batch-size", args.batch_size, 8),
                ("--score-threshold", args.score_threshold, 0.3),
            )
            if value != default
        ]
        if ignored:
            p.error(
                f"--edz takes the model from the artifact manifest; "
                f"conflicting flags: {', '.join(ignored)}"
            )
        predictor = BatchingPredictor.from_artifact(
            args.edz,
            max_delay_ms=args.max_delay_ms,
            max_pending=args.max_pending,
            pipeline_depth=args.pipeline_depth,
        )
    else:
        import efficientdet_tpu as ed
        from efficientdet_tpu.configs import EvalConfig
        from efficientdet_tpu.models.detector import fuse_for_inference

        model, cfg = ed.build_efficientdet(
            args.phi, num_classes=args.num_classes, dtype=jnp.bfloat16
        )
        # jitted init: eager init dispatches hundreds of ops one-by-one,
        # which on a relayed device costs minutes of round-trips
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        )
        if args.checkpoint:
            from efficientdet_tpu.utils.checkpoint import load_params

            variables = load_params(args.checkpoint, variables)
        model, variables = fuse_for_inference(model, variables)
        predictor = BatchingPredictor(
            model,
            variables,
            batch_size=args.batch_size,
            max_delay_ms=args.max_delay_ms,
            eval_config=EvalConfig(score_threshold=args.score_threshold),
            max_pending=args.max_pending,
            pipeline_depth=args.pipeline_depth,
            bucket_batches=not args.no_bucket_batches,
        )

    if not args.skip_warmup:
        print(
            f"warming up {len(predictor._buckets)} batch bucket(s) "
            f"{predictor._buckets} ...", flush=True,
        )
        predictor.warmup()

    server = make_http_server(
        predictor, port=args.port, max_request_mb=args.max_request_mb
    )
    if predictor.manifest is not None:
        m = predictor.manifest["model"]
        print(
            f"serving EfficientDet-D{m['phi']} (from {args.edz}, "
            f"batch={predictor.batch_size}) on :{args.port}/predict",
            flush=True,
        )
    else:
        print(
            f"serving EfficientDet-D{args.phi} on :{args.port}/predict",
            flush=True,
        )
    server.serve_forever()


if __name__ == "__main__":
    main()
