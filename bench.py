"""Benchmark harness: EfficientDet-D0 @512 batched inference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric matches the driver's definition (BASELINE.json:2): COCO-val-style
images/sec/chip at D0 512px, full pipeline on-device (normalise -> forward ->
decode -> clip -> per-class NMS). ``vs_baseline`` is relative to the
north-star target of 2000 img/s on v5e-8 = 250 img/s/chip (BASELINE.json:5).

Run on the real chip:  PYTHONPATH=/root/.axon_site python bench.py
Options: --phi N --batch B --dtype bf16|f32 --steps K
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

BASELINE_IMG_S_PER_CHIP = 250.0  # 2000 img/s on 8 chips


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phi", type=int, default=0)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--trace", default=None,
                   help="directory: capture a jax.profiler trace of the "
                   "timed steps")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import efficientdet_tpu as ed

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, cfg = ed.build_efficientdet(args.phi, num_classes=90, dtype=dtype)
    size = cfg.image_size

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, size, size, 3)))
    # Production inference path: BN folded into conv weights (exact).
    from efficientdet_tpu.models.detector import fuse_for_inference

    model, variables = fuse_for_inference(model, variables)
    variables = jax.device_put(jax.tree.map(jnp.asarray, variables))
    predict = ed.make_predict_fn(model)

    images = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (args.batch, size, size, 3)),
        jnp.uint8,
    )
    images = jax.device_put(images)

    # NOTE: on the axon relay backend block_until_ready can return before
    # execution completes; a host fetch (np.asarray) is the reliable fence.
    for _ in range(args.warmup):
        out = predict(variables, images)
    np.asarray(out[3])

    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = predict(variables, images)
    np.asarray(out[3])  # device executes in-order; fetching the last result
    dt = time.perf_counter() - t0  # fences the whole queue
    if args.trace:
        jax.profiler.stop_trace()

    n_chips = jax.device_count()
    img_s = args.steps * args.batch / dt
    img_s_per_chip = img_s / n_chips
    print(
        json.dumps(
            {
                "metric": f"d{args.phi}_{size}px_inference_throughput",
                "value": round(img_s_per_chip, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s_per_chip / BASELINE_IMG_S_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
