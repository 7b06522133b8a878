"""Training-step throughput microbench (BASELINE.json config 4).

Usage:  python tools/bench_train.py --phi 0 --batch 64 --dtype f32 --steps 10

Measures the full jitted train step (on-device anchor matching + fwd/bwd +
Adam + BN stat update) with a host-fetch fence (block_until_ready is not a
reliable fence on the axon relay backend — README perf notes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phi", type=int, default=0)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--max-gt", type=int, default=100)
    p.add_argument("--remat", action="store_true",
                   help="rematerialise blocks (fits D4+ on one chip)")
    p.add_argument("--remat-scope", default="full",
                   choices=["full", "backbone", "fpn"])
    p.add_argument("--remat-max-stage", type=int, default=7,
                   help="backbone stages above this are saved, not rematted")
    p.add_argument("--grad-accum-steps", type=int, default=1)
    p.add_argument("--fused-optimizer", action="store_true",
                   help="opt-in A/B lever: optax.flatten'd single-vector "
                   "Adam instead of the default leaf-wise update. Default "
                   "matches TrainConfig (leaf-wise) — the on-chip A/B "
                   "measured fused 5%% SLOWER (docs/DESIGN.md 6f), so the "
                   "default bench must exercise what training runs use.")
    p.add_argument("--trace", default=None,
                   help="directory: capture a jax.profiler trace of the "
                   "timed steps")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import efficientdet_tpu as ed
    from efficientdet_tpu.configs import TrainConfig
    from efficientdet_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
    from efficientdet_tpu.train_lib import create_train_state

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, cfg = ed.build_efficientdet(
        args.phi, num_classes=90, dtype=dtype, remat=args.remat,
        remat_scope=args.remat_scope, remat_max_stage=args.remat_max_stage,
    )
    size = cfg.image_size
    tc = TrainConfig(batch_size=args.batch, max_gt_boxes=args.max_gt,
                     grad_accum_steps=args.grad_accum_steps,
                     fused_optimizer=args.fused_optimizer)

    mesh = make_mesh()
    state = create_train_state(model, tc, jax.random.PRNGKey(0))
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    step = make_sharded_train_step(model, tc, mesh)

    rng = np.random.RandomState(0)
    n_gt = 12
    gt_boxes = np.zeros((args.batch, args.max_gt, 4), np.float32)
    gt_labels = np.full((args.batch, args.max_gt), -1, np.int32)
    x1 = rng.uniform(0, size - 64, (args.batch, n_gt))
    y1 = rng.uniform(0, size - 64, (args.batch, n_gt))
    gt_boxes[:, :n_gt, 0] = x1
    gt_boxes[:, :n_gt, 1] = y1
    gt_boxes[:, :n_gt, 2] = x1 + rng.uniform(16, 64, (args.batch, n_gt))
    gt_boxes[:, :n_gt, 3] = y1 + rng.uniform(16, 64, (args.batch, n_gt))
    gt_labels[:, :n_gt] = rng.randint(0, 90, (args.batch, n_gt))
    batch = shard_batch(
        {
            "images": rng.randint(0, 256, (args.batch, size, size, 3)).astype(np.uint8),
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
        },
        mesh,
    )
    step_rng = jax.random.PRNGKey(1)

    for _ in range(args.warmup):
        state, metrics = step(state, batch, step_rng)
    loss = float(metrics["loss"])  # host fetch = fence

    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch, step_rng)
    loss = float(metrics["loss"])  # fence
    dt = time.perf_counter() - t0
    if args.trace:
        jax.profiler.stop_trace()

    img_s_chip = args.steps * args.batch / dt / jax.device_count()
    print(
        json.dumps(
            {
                "metric": f"d{args.phi}_{size}px_train_step_throughput",
                "value": round(img_s_chip, 2),
                "unit": "img/s/chip",
                "dtype": args.dtype,
                "batch": args.batch,
                "ms_per_step": round(1000 * dt / args.steps, 2),
                "loss": round(loss, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
