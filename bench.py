"""Benchmark harness: EfficientDet batched-inference throughput on TPU.

Prints one JSON line per metric; the LAST line is the driver's primary
metric (BASELINE.json:2): COCO-val-style images/sec/chip at D0 512px, full
pipeline on-device (normalise -> forward -> decode -> clip -> per-class
NMS). Runs under an external watchdog (see ``_watchdog_parent``) so an
axon relay outage yields a structured failure line within ~5 min, never a
bare driver timeout kill. The default (flagless) run emits, in order:

  {"event": "backend_ready", ...}        probe succeeded
  {"check": "kernel_parity", ...}        compiled-Pallas == reference gate
  {"metric": "d0_512px_mfu", ...}        roofline context (v5e bf16 peak)
  {"metric": "d0_512px_inference_throughput", ...}   D0 first (kill-safe)
  {"metric": "d4_1024px_inference_throughput", ...}
  {"metric": "d0_512px_inference_throughput", ...}   <- driver parses this

``vs_baseline`` is relative to the north-star 2000 img/s on v5e-8 =
250 img/s/chip for D0 (BASELINE.json:5) and the round-1 measured
209 img/s/chip for D4.

Run on the real chip:  PYTHONPATH=/root/.axon_site python bench.py
Options: --phi N (bench only that phi) --batch B --dtype bf16|f32
         --steps K --trace DIR --skip-parity
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

D0_BASELINE_IMG_S_PER_CHIP = 250.0  # 2000 img/s on 8 chips
# NOTE: the reference has no D4 TPU number, so this baseline is the REPO'S
# OWN round-1 record (208.7 img/s/chip, README) — i.e. D4 vs_baseline is a
# self-regression guard, not a reference comparison; measurement noise of
# a few tenths of a percent around 1.0 is expected (r03 printed 0.9967).
# The emitted JSON carries baseline_kind="self_round1_record" to say so.
D4_BASELINE_IMG_S_PER_CHIP = 208.7  # round-1 measured best (README)
V5E_BF16_PEAK_FLOPS = 197e12  # per chip


def run_kernel_parity():
    """Compiled-on-this-backend Pallas kernels vs reference implementations.

    VERDICT r1 weak #2 / next-round #7: CI exercises the kernels only in
    interpret mode on CPU; a Mosaic lowering change must fail HERE, loudly,
    not surface as silently wrong detections. Raises on mismatch (non-zero
    bench rc -> red driver artifact).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientdet_tpu.anchors import iou_matrix
    from efficientdet_tpu.ops.nms import _fixpoint_suppress
    from efficientdet_tpu.ops.nms_pallas import suppression_keep_mask
    from efficientdet_tpu.ops.head_pallas import (
        head_pointwise_anchor_major,
        head_pointwise_reference,
    )

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.RandomState(0)

    # --- suppression kernel ---
    B, K = 4, 1024
    xy = rng.uniform(0, 400, (B, K, 2))
    wh = rng.uniform(10, 150, (B, K, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    classes = jnp.asarray(rng.randint(0, 16, (B, K)), jnp.int32)
    valid = jnp.asarray(rng.rand(B, K) > 0.1)

    def xla_keep(b, c, v):
        def one(bx, cl, va):
            ious = iou_matrix(bx, bx)
            same = cl[:, None] == cl[None, :]
            k = bx.shape[0]
            tri = (
                jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
            )
            return _fixpoint_suppress((ious > 0.5) & same & tri, va)

        return jax.vmap(one)(b, c, v)

    want = np.asarray(jax.jit(xla_keep)(boxes, classes, valid))
    got = np.asarray(
        jax.jit(
            lambda b, c, v: suppression_keep_mask(
                b, c, v, interpret=not on_tpu
            )
        )(boxes, classes, valid)
    )
    if not np.array_equal(got, want):
        raise AssertionError(
            f"suppression_keep_mask compiled-kernel MISMATCH: "
            f"{int((got != want).sum())}/{got.size} elements differ"
        )

    # --- anchor-major head pointwise kernel ---
    M, CIN, A, OUT = 1000, 64, 9, 12
    x2d = jnp.asarray(rng.normal(size=(M, CIN)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(CIN, A * OUT)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(A * OUT,)), jnp.float32)
    z, amax, m = jax.jit(
        lambda x, k, b: head_pointwise_anchor_major(
            x, k, b, A, interpret=not on_tpu
        )
    )(x2d, kernel, bias)
    zr, amaxr, _ = jax.jit(
        lambda x, k, b: head_pointwise_reference(x, k, b, A)
    )(x2d, kernel, bias)
    if not np.allclose(
        np.asarray(z)[:, :m], np.asarray(zr)[:, :m], atol=2e-5
    ) or not np.allclose(
        np.asarray(amax)[:, :m], np.asarray(amaxr)[:, :m], atol=2e-5
    ):
        dz = np.abs(np.asarray(z)[:, :m] - np.asarray(zr)[:, :m]).max()
        raise AssertionError(
            f"head_pointwise_anchor_major compiled-kernel MISMATCH: "
            f"max|dz|={dz}"
        )

    print(
        json.dumps(
            {
                "check": "kernel_parity",
                "ok": True,
                "backend": jax.default_backend(),
                "compiled": bool(on_tpu),
            }
        ),
        flush=True,
    )


def bench_phi(phi, batch, steps, warmup, dtype_name, trace_dir=None,
              report_mfu=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import efficientdet_tpu as ed
    from efficientdet_tpu.models.detector import fuse_for_inference
    from efficientdet_tpu.utils.profiling import flops_estimate

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model, cfg = ed.build_efficientdet(phi, num_classes=90, dtype=dtype)
    size = cfg.image_size

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, size, size, 3)))
    # Production inference path: BN folded into conv weights (exact).
    model, variables = fuse_for_inference(model, variables)
    variables = jax.device_put(jax.tree.map(jnp.asarray, variables))
    predict = ed.make_predict_fn(model)

    images = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, size, size, 3)),
        jnp.uint8,
    )
    images = jax.device_put(images)

    # NOTE: on the axon relay backend block_until_ready can return before
    # execution completes; a host fetch (np.asarray) is the reliable fence.
    for _ in range(max(warmup, 1)):  # >=1: compile outside the timed loop
        out = predict(variables, images)
    np.asarray(out[3])

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = predict(variables, images)
    np.asarray(out[3])  # device executes in-order; fetching the last result
    dt = time.perf_counter() - t0  # fences the whole queue
    if trace_dir:
        jax.profiler.stop_trace()

    n_chips = jax.device_count()
    img_s = steps * batch / dt
    img_s_per_chip = img_s / n_chips

    if report_mfu:
        flops = flops_estimate(predict, variables, images)
        if flops:
            mfu = flops / batch * img_s_per_chip / V5E_BF16_PEAK_FLOPS
            print(
                json.dumps(
                    {
                        "metric": f"d{phi}_{size}px_mfu",
                        "value": round(mfu, 4),
                        "unit": "fraction_of_v5e_bf16_peak",
                        "flops_per_image": round(flops / batch / 1e9, 2),
                        "vs_baseline": round(mfu, 4),
                    }
                ),
                flush=True,
            )

    baseline = (
        D0_BASELINE_IMG_S_PER_CHIP if phi == 0 else D4_BASELINE_IMG_S_PER_CHIP
    )
    record = {
        "metric": f"d{phi}_{size}px_inference_throughput",
        "value": round(img_s_per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s_per_chip / baseline, 4),
    }
    if phi != 0:
        # vs_baseline here compares against the repo's OWN best (the
        # reference has no TPU number at this phi) — a parser treating
        # <1.0 as regression should allow noise (see constant above).
        record["baseline_kind"] = "self_round1_record"
    print(json.dumps(record), flush=True)
    return record


_CHILD_ENV = "_BENCH_CHILD"
_SENTINEL_ENV = "_BENCH_PROBE_SENTINEL"
_PROBE_WINDOW_S = 120  # per attempt: backend must answer within this
_MAX_ATTEMPTS = 2
_RETRY_SLEEP_S = 60


def _watchdog_parent():
    """Run the real bench in a child process under an external watchdog.

    Why a separate process (VERDICT r2 missing #2 / weak #1): during an
    axon relay outage the backend-init hang sits in C code that never
    returns to the Python bytecode loop, so an in-process ``signal.alarm``
    handler NEVER runs — round 2's alarm-guarded probe still hung until the
    driver's timeout produced an unparseable rc=124 artifact. Only a
    separate watchdog process that never imports jax can bound the hang.

    Protocol: the child (same argv, ``_BENCH_CHILD=1``) probes the backend
    first and touches a sentinel file the moment ``jax.devices()`` returns;
    it then runs the actual benchmarks with no watchdog (big-model compiles
    on a loaded relay can legitimately take many minutes — the driver's own
    window governs). If the sentinel does not appear within
    ``_PROBE_WINDOW_S`` the parent SIGKILLs the child and retries; after
    ``_MAX_ATTEMPTS`` it prints ONE structured JSON failure line and exits
    non-zero — worst case ~5 min, never a bare timeout kill.
    """
    import os
    import signal
    import subprocess
    import tempfile

    def _killpg(proc, sig=signal.SIGKILL):
        """Kill the child's whole process group (it runs in its own
        session), so a watchdog kill can't orphan grandchildren holding
        the chip."""
        try:
            os.killpg(proc.pid, sig)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        proc.wait()

    last_err = "backend probe hang (no sentinel within window)"
    last_kind = "hang"
    for attempt in range(1, _MAX_ATTEMPTS + 1):
        fd, sentinel = tempfile.mkstemp(prefix="bench_probe_")
        os.close(fd)
        os.unlink(sentinel)  # child recreates it on probe success
        env = dict(os.environ)
        env[_CHILD_ENV] = "1"
        env[_SENTINEL_ENV] = sentinel
        child = subprocess.Popen(
            [sys.executable] + sys.argv, env=env, start_new_session=True
        )

        # forward a pid-targeted kill of THIS parent to the child's group —
        # otherwise the driver's timeout kill would leave the real bench
        # running and holding the TPU for whatever runs next
        def _forward(signum, frame, _child=child):
            _killpg(_child)
            sys.exit(128 + signum)

        signal.signal(signal.SIGTERM, _forward)
        signal.signal(signal.SIGINT, _forward)

        deadline = time.time() + _PROBE_WINDOW_S
        probed = False
        while time.time() < deadline:
            if os.path.exists(sentinel):
                probed = True
                break
            if child.poll() is not None:
                break
            time.sleep(1)
        if probed:
            sys.exit(child.wait())
        if child.poll() is None:
            _killpg(child)
            last_err = (
                f"backend probe hung >{_PROBE_WINDOW_S}s (axon relay outage);"
                " child group SIGKILLed"
            )
            last_kind = "hang"
        elif child.returncode == 0:
            sys.exit(0)  # child finished without probing (e.g. --help)
        else:
            last_err = f"bench child exited rc={child.returncode} before probe"
            last_kind = "child_error"
        print(
            json.dumps(
                {
                    "event": "backend_unavailable_retry",
                    "attempt": attempt,
                    "of": _MAX_ATTEMPTS,
                    "error": last_err,
                }
            ),
            flush=True,
        )
        if attempt < _MAX_ATTEMPTS:
            time.sleep(_RETRY_SLEEP_S)
    if last_kind == "hang":
        print(
            json.dumps(
                {
                    "event": "backend_unavailable",
                    "attempts": _MAX_ATTEMPTS,
                    "error": last_err,
                    "note": "structured fast-fail; relay outage, "
                            "not a code bug",
                }
            ),
            flush=True,
        )
        sys.exit(3)
    print(
        json.dumps(
            {
                "event": "bench_child_failed",
                "attempts": _MAX_ATTEMPTS,
                "error": last_err,
                "note": "child died BEFORE the backend probe — likely a "
                        "code/import bug, not an outage",
            }
        ),
        flush=True,
    )
    sys.exit(4)


def _probe_backend_and_signal():
    """(Child) touch the sentinel once the accelerator backend answers."""
    import os

    import jax

    devs = jax.devices()
    sentinel = os.environ.get(_SENTINEL_ENV)
    if sentinel:
        with open(sentinel, "w") as f:
            f.write(jax.default_backend())
    print(
        json.dumps(
            {
                "event": "backend_ready",
                "backend": jax.default_backend(),
                "n_devices": len(devs),
            }
        ),
        flush=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phi", type=int, default=None,
                   help="bench ONLY this phi (default: D4 then D0)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--skip-parity", action="store_true")
    p.add_argument("--trace", default=None,
                   help="directory: capture a jax.profiler trace of the "
                   "timed steps")
    args = p.parse_args()

    import os

    if not os.environ.get(_CHILD_ENV):
        _watchdog_parent()
        return  # unreachable (parent exits)

    _probe_backend_and_signal()

    if not args.skip_parity:
        run_kernel_parity()

    if args.phi is not None:
        bench_phi(args.phi, args.batch or 128, args.steps, args.warmup,
                  args.dtype, args.trace, report_mfu=True)
        return

    # Driver metrics (BASELINE.json:2). D0 runs FIRST so a mid-run driver
    # kill still leaves the primary metric in the artifact tail; its line
    # is re-emitted LAST because the driver parses the final JSON line.
    d0 = bench_phi(0, args.batch or 128, args.steps, args.warmup, args.dtype,
                   args.trace, report_mfu=True)
    bench_phi(4, args.batch or 64, max(args.steps // 2, 5), args.warmup,
              args.dtype)
    print(json.dumps(d0), flush=True)


if __name__ == "__main__":
    main()
