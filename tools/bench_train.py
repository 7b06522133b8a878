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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--phi", default="0",
                   help="0..7, or 'tiny' (CPU plumbing smoke mode)")
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
    p.add_argument("--pipeline", action="store_true",
                   help="feed the step from the REAL host input pipeline "
                   "(data.common.batch_iterator over a synthetic dataset, "
                   "letterbox + target assembly + batch build per step, "
                   "prefetch overlap) instead of one reused device batch — "
                   "measures SUSTAINED train throughput incl. the host "
                   "(VERDICT r4 next #6; SURVEY 3.1's hot loop includes "
                   "the generator)")
    p.add_argument("--workers", type=int, default=0,
                   help="--pipeline: thread-pool size for per-image host "
                   "work (0 = inline)")
    p.add_argument("--augment", default="none", choices=["none", "host"],
                   help="--pipeline: random affine/visual augmentation on "
                   "the host path")
    p.add_argument("--echo", type=int, default=1,
                   help="--pipeline: data echoing factor — consume each "
                   "uploaded batch E times (with --device-augment each "
                   "echo is a DIFFERENT augmented view). Cuts per-step "
                   "host->device bytes by E for datasets that don't fit "
                   "HBM (Choi et al. 2019; DESIGN.md 6k)")
    p.add_argument("--device-cache", type=int, default=0,
                   help="--pipeline: cache N letterboxed images resident "
                   "in HBM (data/device_cache.py) and feed steps by "
                   "on-device gather — per-step H2D is just the indices")
    p.add_argument("--device-augment", action="store_true",
                   help="fuse random affine+color augmentation into the "
                   "train step's XLA program (TrainConfig.device_augment)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import efficientdet_tpu as ed
    from efficientdet_tpu.configs import TrainConfig
    from efficientdet_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
    from efficientdet_tpu.train_lib import create_train_state

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.phi == "tiny":  # CPU plumbing smoke mode (no meaning on TPU)
        import dataclasses

        from efficientdet_tpu.configs import ModelConfig
        from efficientdet_tpu.models.detector import EfficientDet

        cfg = dataclasses.replace(
            ModelConfig.for_phi(0, num_classes=8, image_size=128),
            backbone="efficientnet-tiny", bifpn_width=8, bifpn_depth=1,
            head_depth=1,
        )
        model = EfficientDet(config=cfg)
    else:
        model, cfg = ed.build_efficientdet(
            int(args.phi), num_classes=90, dtype=dtype, remat=args.remat,
            remat_scope=args.remat_scope,
            remat_max_stage=args.remat_max_stage,
        )
    size = cfg.image_size
    tc = TrainConfig(batch_size=args.batch, max_gt_boxes=args.max_gt,
                     grad_accum_steps=args.grad_accum_steps,
                     fused_optimizer=args.fused_optimizer,
                     device_augment=args.device_augment)

    mesh = make_mesh()
    state = create_train_state(model, tc, jax.random.PRNGKey(0))
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    step = make_sharded_train_step(model, tc, mesh)

    if args.pipeline:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench_data",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_data.py"),
        )
        bench_data = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench_data)
        from efficientdet_tpu.data.common import batch_iterator, prefetch

        augment = None
        if args.augment == "host":
            from efficientdet_tpu.data.augment import make_augmenter

            augment = make_augmenter()
        ds = bench_data.SyntheticDataset(
            max(args.batch * (args.steps + args.warmup), 256,
                args.device_cache)
        )

        keys = ("images", "gt_boxes", "gt_labels")
        if args.device_augment:
            keys += ("extents",)

        if args.device_cache:
            from efficientdet_tpu.data import DeviceDataCache

            cache = DeviceDataCache(
                ds, target_size=size, max_gt=args.max_gt, mesh=mesh,
                limit=args.device_cache,
            )
            print(json.dumps({
                "note": "device cache resident",
                "images": len(cache),
                "pool_mb": round(cache.nbytes() / 1e6, 1),
            }))
            it = iter(
                {k: b[k] for k in keys}
                for b in cache.batches(args.batch, seed=0)
            )
            mode = "devcache"
        else:
            def sharded_stream():
                # shard_batch (device_put) INSIDE the prefetched generator
                # so the host->device upload of the next batch overlaps the
                # current step's compute — on a relayed device the upload
                # is hundreds of ms and would otherwise serialise with the
                # step
                for b in batch_iterator(
                    ds, args.batch, target_size=size, max_gt=args.max_gt,
                    shuffle=True, repeat=True, augment=augment,
                    workers=args.workers,
                ):
                    yield shard_batch({k: b[k] for k in keys}, mesh)

            def echoed(stream):
                for b in stream:
                    for _ in range(max(args.echo, 1)):
                        yield b

            it = echoed(prefetch(sharded_stream()))
            mode = "pipeline"

        # fold the step index into the rng so echoed replays of one
        # uploaded batch see DIFFERENT device augmentations
        base_rng = jax.random.PRNGKey(1)

        for i in range(args.warmup):
            state, metrics = step(state, next(it),
                                  jax.random.fold_in(base_rng, i))
        loss = float(metrics["loss"])  # fence

        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step(state, next(it),
                                  jax.random.fold_in(base_rng, i))
        loss = float(metrics["loss"])  # fence
        dt = time.perf_counter() - t0

        print(json.dumps({
            "metric": f"d{args.phi}_{size}px_train_{mode}_throughput",
            "value": round(args.steps * args.batch / dt
                           / jax.device_count(), 2),
            "unit": "img/s/chip",
            "dtype": args.dtype,
            "batch": args.batch,
            "workers": args.workers,
            "augment": args.augment,
            "echo": args.echo,
            "device_cache": args.device_cache,
            "device_augment": args.device_augment,
            "ms_per_step": round(1000 * dt / args.steps, 2),
            "loss": round(loss, 4),
        }))
        return

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
