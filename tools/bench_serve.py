"""Serving latency/throughput benchmark for the micro-batching predictor.

Closed-loop load against ``serve.BatchingPredictor`` on the local chip:
C client threads each loop ``predict_sync`` for a fixed duration; per-
request wall latency is recorded and summarised as p50/p95/p99 plus the
sustained img/s. Sweeping C shows the batching/latency trade the server
makes (requests wait up to --max-delay-ms for a batch to fill, so low
concurrency pays the flush timer and high concurrency pays queueing).

One JSON line per concurrency level:

  {"bench": "serve", "concurrency": 32, "img_s": ..., "p50_ms": ...,
   "p95_ms": ..., "p99_ms": ..., "overloaded": 0, ...}

With ``--http`` the same load runs through the real HTTP handler on a
loopback ``ThreadingHTTPServer`` (stdlib client), measuring the full
POST-image -> JSON-detections path instead of the in-process API.

Random weights (BN-folded) by default — throughput/latency do not depend
on weight values; pass --checkpoint/--edz for a real model. CPU-runnable
for plumbing (tiny backbone via --phi tiny), meaningful numbers on TPU:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serve.py \
      --phi 0 --batch-size 32 --duration 10 --concurrency 1,8,32,64
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import threading
import time

import numpy as np


def build_predictor(args):
    import jax
    import jax.numpy as jnp

    from efficientdet_tpu.configs import EvalConfig, ModelConfig
    from efficientdet_tpu.models.detector import (
        EfficientDet,
        fuse_for_inference,
    )
    from efficientdet_tpu.serve import BatchingPredictor

    if args.edz:
        return BatchingPredictor.from_artifact(
            args.edz, max_delay_ms=args.max_delay_ms,
            pipeline_depth=args.pipeline_depth,
        )

    if args.phi == "tiny":  # CPU plumbing mode
        cfg = dataclasses.replace(
            ModelConfig.for_phi(0, num_classes=8, image_size=128),
            backbone="efficientnet-tiny", bifpn_width=8, bifpn_depth=1,
            head_depth=1,
        )
        model = EfficientDet(config=cfg)
    else:
        import efficientdet_tpu as ed

        model, cfg = ed.build_efficientdet(
            int(args.phi), num_classes=args.num_classes, dtype=jnp.bfloat16
        )
    # jitted init: eager init dispatches hundreds of ops one-by-one, which
    # on the axon relay backend costs minutes of round-trips
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )
    if args.checkpoint:
        from efficientdet_tpu.utils.checkpoint import load_params

        variables = load_params(args.checkpoint, variables)
    if args.phi != "tiny":
        model, variables = fuse_for_inference(model, variables)
    return BatchingPredictor(
        model, variables,
        batch_size=args.batch_size,
        max_delay_ms=args.max_delay_ms,
        eval_config=EvalConfig(score_threshold=args.score_threshold),
        pipeline_depth=args.pipeline_depth,
        bucket_batches=not args.no_bucket_batches,
    )


def run_level(call, concurrency: int, duration_s: float):
    """Closed-loop load: returns (latencies_ms, overloaded, timeouts,
    conn_errors, elapsed_s)."""
    import urllib.error

    from efficientdet_tpu.serve import PredictorOverloaded

    lat: list[float] = []
    overloaded = 0
    timeouts = 0
    conn_errors = 0
    lock = threading.Lock()
    stop = time.perf_counter() + duration_s

    def client():
        nonlocal overloaded, timeouts, conn_errors
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                call()
            except PredictorOverloaded:
                with lock:
                    overloaded += 1
                time.sleep(0.005)
                continue
            except TimeoutError:
                # predict_sync Future timeout / socket timeout in --http
                # mode: count it (like overloaded) instead of silently
                # killing the client thread and skewing img_s.
                with lock:
                    timeouts += 1
                continue
            except (urllib.error.URLError, ConnectionError, OSError):
                # --http transport errors (e.g. ECONNRESET when a burst
                # overran a listen backlog): count and keep the client
                # alive — 31 dead threads once halved a c=64 level's img/s
                # with zero indication in the output.
                with lock:
                    conn_errors += 1
                time.sleep(0.005)
                continue
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t_start
    return lat, overloaded, timeouts, conn_errors, elapsed


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--phi", default="0", help="0..7, or 'tiny' (CPU plumbing)")
    p.add_argument("--num-classes", type=int, default=90)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--edz", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--pipeline-depth", type=int, default=2)
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--duration", type=float, default=10.0,
                   help="seconds of load per concurrency level")
    p.add_argument("--concurrency", default="1,8,32,64")
    p.add_argument("--http", action="store_true",
                   help="drive the real HTTP handler over loopback")
    p.add_argument("--no-bucket-batches", action="store_true",
                   help="always pad partial micro-batches to --batch-size "
                   "(disables the power-of-two bucket programs)")
    args = p.parse_args(argv)

    predictor = build_predictor(args)
    size = predictor.size
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (size, size, 3)).astype(np.uint8)

    server = None
    if args.http:
        import urllib.request
        from io import BytesIO

        from PIL import Image

        from efficientdet_tpu.serve import make_http_server

        buf = BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        body = buf.getvalue()
        server = make_http_server(predictor, host="127.0.0.1")
        threading.Thread(target=server.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{server.server_port}/predict"

        def call(timeout=60):
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=timeout) as r:
                json.loads(r.read())
    else:
        def call(timeout=30):
            predictor.predict_sync(img, timeout=timeout)

    # Warm-up pays the XLA compiles IN-PROC even in --http mode: holding an
    # HTTP connection open across a multi-minute cold compile trips the
    # handler's per-request deadline (504) and measures nothing useful.
    # warmup() compiles EVERY batch bucket, so no concurrency level hits a
    # cold program mid-measurement.
    predictor.warmup()
    call()  # one warm-up through the measured path (HTTP or in-proc)
    print(json.dumps({
        "bench": "serve", "event": "ready",
        "mode": "http" if args.http else "inproc",
        "phi": args.phi, "batch_size": predictor.batch_size,
        "buckets": predictor._buckets,
        "max_delay_ms": args.max_delay_ms,
        "pipeline_depth": args.pipeline_depth, "image_size": size,
    }), flush=True)

    for c in [int(x) for x in args.concurrency.split(",")]:
        lat, overloaded, timeouts, conn_errors, elapsed = run_level(
            call, c, args.duration
        )
        if not lat:
            # every request shed/timed out: report that rather than crash
            # in np.percentile on an empty array.
            print(json.dumps({
                "bench": "serve", "concurrency": c, "img_s": 0.0,
                "n": 0, "overloaded": overloaded, "timeouts": timeouts,
                "conn_errors": conn_errors,
            }), flush=True)
            continue
        lat_a = np.asarray(lat)
        print(json.dumps({
            "bench": "serve",
            "concurrency": c,
            "img_s": round(len(lat) / elapsed, 2),
            "p50_ms": round(float(np.percentile(lat_a, 50)), 2),
            "p95_ms": round(float(np.percentile(lat_a, 95)), 2),
            "p99_ms": round(float(np.percentile(lat_a, 99)), 2),
            "n": len(lat),
            "overloaded": overloaded,
            "timeouts": timeouts,
            "conn_errors": conn_errors,
        }), flush=True)

    if server is not None:
        server.shutdown()
    predictor.close()


if __name__ == "__main__":
    main()
