"""Training CLI (reference ``train.py``, SURVEY.md SS2 "Training CLI").

Flag names mirror the reference for API familiarity:

    python -m efficientdet_tpu.train coco  /data/coco  --phi 0 ...
    python -m efficientdet_tpu.train pascal /data/VOC2012 ...
    python -m efficientdet_tpu.train csv annots.csv classes.csv ...

The loop is TPU-native: one jitted, data-parallel-sharded step does
preprocessed-batch -> on-device anchor matching -> fwd/bwd -> Adam update;
the host only feeds letterboxed uint8 batches and logs metrics. Callback
equivalents: orbax CheckpointManager (ModelCheckpoint), ReduceLROnPlateau
logic on epoch mAP (host-side), JSONL metrics (TensorBoard scalars).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train an EfficientDet model (TPU-native).")
    sub = p.add_subparsers(dest="dataset_type", required=True)

    coco = sub.add_parser("coco")
    coco.add_argument("coco_path")
    coco.add_argument("--train-set", default="train2017")
    coco.add_argument("--val-set", default="val2017")

    pascal = sub.add_parser("pascal")
    pascal.add_argument("pascal_path")
    pascal.add_argument("--train-set", default="trainval")
    pascal.add_argument("--val-set", default="test")

    csv_ = sub.add_parser("csv")
    csv_.add_argument("annotations_path")
    csv_.add_argument("classes_path")
    csv_.add_argument("--val-annotations-path")

    for q in (coco, pascal, csv_):
        q.add_argument("--phi", type=int, default=0, choices=range(8))
        q.add_argument("--weighted-bifpn", action="store_true", default=None,
                       help="force weighted fusion (default: per-phi — "
                            "weighted for D0-D5, unweighted for D6/D7)")
        q.add_argument("--no-weighted-bifpn", dest="weighted_bifpn",
                       action="store_false")
        q.add_argument("--freeze-backbone", action="store_true")
        q.add_argument("--freeze-bn", action="store_true")
        q.add_argument("--batch-size", type=int, default=8)
        q.add_argument("--epochs", type=int, default=50)
        q.add_argument("--steps", type=int, default=None,
                       help="steps per epoch (default: dataset//batch)")
        q.add_argument("--lr", type=float, default=1e-3)
        q.add_argument("--snapshot", default=None,
                       help="checkpoint dir to resume from, or 'imagenet' "
                            "(reference semantics; needs converted weights)")
        q.add_argument("--snapshot-path", default="checkpoints")
        q.add_argument("--random-transform", action="store_true")
        q.add_argument("--device-augment", action="store_true",
                       help="run random affine + colour augmentation ON "
                       "DEVICE inside the jitted step (ops/augment.py); "
                       "the host only decodes + letterboxes. Implies the "
                       "--random-transform family of transforms.")
        q.add_argument("--device-cache", type=int, default=0, metavar="N",
                       help="keep the first N letterboxed images RESIDENT "
                       "in device memory (data/device_cache.py) and feed "
                       "steps by on-device gather — per-step host->device "
                       "traffic is just the batch indices. For datasets / "
                       "fine-tune windows that fit HBM; pair with "
                       "--device-augment for per-epoch randomness "
                       "(docs/DESIGN.md 6k). 0 = off.")
        q.add_argument("--data-echo", type=int, default=1, metavar="E",
                       help="data echoing (arXiv:1907.05550): consume each "
                       "host batch E times; with --device-augment every "
                       "echo is a different augmented view. Cuts per-step "
                       "host->device bytes by E when the input pipeline "
                       "or link, not the chip, is the bottleneck.")
        q.add_argument("--compute-val-loss", action="store_true")
        q.add_argument("--max-gt", type=int, default=100)
        q.add_argument("--grad-accum-steps", type=int, default=1,
                       help="accumulate k gradients per optimiser update "
                       "(effective batch = k * batch-size)")
        q.add_argument("--ema-decay", type=float, default=0.0,
                       help="keep an EMA of params for eval (0 = off)")
        q.add_argument("--image-size", type=int, default=None)
        q.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
        q.add_argument("--remat", action="store_true",
                       help="rematerialise blocks in the backward "
                       "pass (fits D4+ training on one chip)")
        q.add_argument("--remat-scope", default="full",
                       choices=["full", "backbone", "fpn"],
                       help="which components remat applies to")
        q.add_argument("--log-file", default=None)
        q.add_argument("--tensorboard-dir", default=None,
                       help="write scalar summaries as TF event files "
                            "(reference TensorBoard callback)")
        q.add_argument("--no-eval", action="store_true")
        q.add_argument("--eval-every", type=int, default=1, help="epochs")
        q.add_argument("--reduce-lr-patience", type=int, default=2)
        q.add_argument("--reduce-lr-factor", type=float, default=0.1)
        q.add_argument("--workers", type=int, default=0,
                       help="host data-loading threads per batch "
                            "(reference fit_generator workers)")
        q.add_argument("--seed", type=int, default=0)
        q.add_argument("--debug-nans", action="store_true",
                       help="enable jax_debug_nans (SURVEY.md SS5 sanitizers)")
    return p.parse_args(argv)


def build_dataset(args, train: bool):
    from efficientdet_tpu.data import CocoDataset, CsvDataset, PascalVocDataset

    if args.dataset_type == "coco":
        return CocoDataset(args.coco_path, args.train_set if train else args.val_set)
    if args.dataset_type == "pascal":
        return PascalVocDataset(
            args.pascal_path, args.train_set if train else args.val_set
        )
    if train:
        return CsvDataset(args.annotations_path, args.classes_path)
    if args.val_annotations_path:
        return CsvDataset(args.val_annotations_path, args.classes_path)
    return None


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    import efficientdet_tpu as ed
    from efficientdet_tpu.configs import TrainConfig
    from efficientdet_tpu.data.augment import make_augmenter
    from efficientdet_tpu.data.common import batch_iterator
    from efficientdet_tpu.parallel import (
        make_mesh,
        make_sharded_predict_fn,
        make_sharded_train_step,
        shard_batch,
    )
    from efficientdet_tpu.train_lib import create_train_state
    from efficientdet_tpu.utils.checkpoint import CheckpointManager

    train_ds = build_dataset(args, train=True)
    val_ds = build_dataset(args, train=False)
    num_classes = train_ds.num_classes()

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, cfg = ed.build_efficientdet(
        args.phi,
        num_classes=num_classes,
        weighted_bifpn=args.weighted_bifpn,
        freeze_bn=args.freeze_bn,
        dtype=dtype,
        image_size=args.image_size,
        remat=args.remat,
        remat_scope=args.remat_scope,
    )
    size = cfg.image_size
    print(f"EfficientDet-D{args.phi} | {size}px | {num_classes} classes | "
          f"{jax.device_count()} device(s)", flush=True)

    steps_per_epoch = args.steps or max(1, len(train_ds) // args.batch_size)
    tc = TrainConfig(
        batch_size=args.batch_size,
        learning_rate=args.lr,
        epochs=args.epochs,
        steps_per_epoch=steps_per_epoch,
        max_gt_boxes=args.max_gt,
        freeze_backbone=args.freeze_backbone,
        grad_accum_steps=args.grad_accum_steps,
        ema_decay=args.ema_decay,
        device_augment=args.device_augment,
    )
    # Resuming: the snapshot's opt_state structure must win over this run's
    # default (orbax refuses a mismatched pytree). Snapshots written before
    # fused_optimizer existed are leaf-wise (False).
    if args.snapshot and args.snapshot != "imagenet":
        import dataclasses as _dc

        snap_cfg = os.path.join(args.snapshot, "train_config.json")
        saved_fused = False
        if os.path.exists(snap_cfg):
            with open(snap_cfg) as f:
                saved_fused = json.load(f).get("train", {}).get(
                    "fused_optimizer", False
                )
        if saved_fused != tc.fused_optimizer:
            print(
                f"snapshot opt_state is "
                f"{'fused' if saved_fused else 'leaf-wise'}; matching "
                f"fused_optimizer={saved_fused} for resume", flush=True,
            )
            tc = _dc.replace(tc, fused_optimizer=saved_fused)

    # Persist configs next to the snapshots: restore (evaluate.py, --snapshot
    # resume) must rebuild a TrainState template with the SAME structure
    # (MultiSteps opt_state, ema_params) or orbax refuses the pytree.
    os.makedirs(args.snapshot_path, exist_ok=True)
    import dataclasses as _dc

    with open(os.path.join(args.snapshot_path, "train_config.json"), "w") as f:
        json.dump(
            {
                "train": _dc.asdict(tc),
                "model": {
                    "phi": args.phi,
                    "num_classes": num_classes,
                    "weighted_bifpn": cfg.weighted_bifpn,
                    "freeze_bn": args.freeze_bn,
                    "image_size": size,
                },
            },
            f,
            indent=1,
        )

    mesh = make_mesh()
    data_ways = mesh.shape.get("data", 1)
    if args.batch_size % data_ways:
        raise SystemExit(
            f"--batch-size {args.batch_size} is not divisible by the "
            f"{data_ways}-way data-parallel axis ({jax.device_count()} "
            "devices): every device must get an equal batch slice"
        )
    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(model, tc, rng)
    ckpt = CheckpointManager(args.snapshot_path)
    if args.snapshot == "imagenet":
        # Reference: download ImageNet-pretrained backbone weights by hash.
        # This environment has no egress; import official weights offline
        # with utils/convert.py and pass the resulting checkpoint dir.
        raise SystemExit(
            "--snapshot imagenet needs pretrained weights, which cannot be "
            "downloaded here. Convert an official EfficientNet/EfficientDet "
            "checkpoint with efficientdet_tpu.utils.convert and pass its "
            "directory instead."
        )
    if args.snapshot:
        state = CheckpointManager(args.snapshot).restore(state)
        print(f"resumed from {args.snapshot} at step {int(state.step)}")
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    step_fn = make_sharded_train_step(model, tc, mesh)

    augment = (
        make_augmenter()
        if args.random_transform and not args.device_augment
        else None
    )
    from efficientdet_tpu.data.common import prefetch

    device_fed = args.device_cache > 0
    if device_fed:
        if args.random_transform and not args.device_augment:
            raise SystemExit(
                "--device-cache stores the letterboxed pixels once, so "
                "host-side --random-transform can't apply; use "
                "--device-augment (the fused on-device augmenter)"
            )
        if jax.process_count() > 1:
            raise SystemExit(
                "--device-cache is single-process for now (the pool is "
                "built from this process's view of the dataset); use the "
                "host pipeline with --data-echo on multi-host runs"
            )
        from efficientdet_tpu.data.device_cache import DeviceDataCache

        cache = DeviceDataCache(
            train_ds, target_size=size, max_gt=args.max_gt, mesh=mesh,
            limit=args.device_cache,
        )
        print(json.dumps({
            "device_cache_images": len(cache),
            "device_cache_mb": round(cache.nbytes() / 1e6, 1),
        }), flush=True)
        # drop_last=False: the cache's home turf is small fine-tune
        # datasets, where batch > dataset must wrap-pad, not error
        it = cache.batches(args.batch_size, seed=args.seed,
                           drop_last=False)
    else:
        it = prefetch(
            batch_iterator(
                train_ds, args.batch_size, target_size=size,
                max_gt=args.max_gt,
                shuffle=True, repeat=True, augment=augment, seed=args.seed,
                workers=args.workers,
                # multi-host: each process iterates a disjoint slice of the
                # same seed-agreed permutation (no cross-host coordination)
                shard_index=jax.process_index(),
                shard_count=jax.process_count(),
            ),
            size=2,
        )
    if args.data_echo > 1:
        # per-echo randomness comes from the step's fold_in(rng, state.step)
        it = (b for b in it for _ in range(args.data_echo))

    log_path = args.log_file or os.path.join(args.snapshot_path, "train_log.jsonl")
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    logf = open(log_path, "a")

    tb = None
    if args.tensorboard_dir:
        try:  # TF is only needed for event-file writing; degrade gracefully
            import tensorflow as tf

            tb = tf.summary.create_file_writer(args.tensorboard_dir)
        except Exception as e:  # pragma: no cover - env without TF
            print(f"tensorboard disabled ({e})", flush=True)

    def tb_scalars(step, scalars):
        if tb is None:
            return
        import tensorflow as tf

        with tb.as_default(step=step):
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    tf.summary.scalar(k, v)

    # Host mirror of the plateau multiplier. On --snapshot resume it must
    # start from the RESTORED value, or the first plateau after resume
    # would overwrite a decayed scale with 1.0*factor and RAISE the LR.
    lr_scale = (
        float(state.lr_scale) if state.lr_scale is not None else 1.0
    )
    best_map, bad_epochs = -1.0, 0
    step_rng = jax.random.PRNGKey(args.seed + 1)
    t_epoch = time.time()
    for epoch in range(args.epochs):
        agg = {}
        for s in range(steps_per_epoch):
            batch = next(it)
            # uint8 batch; the jitted step normalises on-device (fused)
            step_batch = {
                "images": batch["images"],
                "gt_boxes": batch["gt_boxes"],
                "gt_labels": batch["gt_labels"],
            }
            if args.device_augment:
                # visible-image extent per canvas: device-side box clipping
                step_batch["extents"] = batch["extents"]
            if device_fed:
                device_batch = step_batch  # gathered on-device, sharded
            else:
                device_batch = shard_batch(step_batch, mesh)
            state, metrics = step_fn(state, device_batch, step_rng)
            if s % 50 == 0 or s == steps_per_epoch - 1:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(epoch=epoch, step=int(state.step),
                         sec=round(time.time() - t_epoch, 1))
                print(json.dumps(m), flush=True)
                logf.write(json.dumps(m) + "\n")
                logf.flush()
                tb_scalars(int(state.step), m)
                agg = m
        # --- epoch end: eval + checkpoint + ReduceLROnPlateau ---
        epoch_metrics = {"loss": agg.get("loss", 0.0)}
        if args.compute_val_loss and val_ds is not None:
            from efficientdet_tpu.data.common import batch_iterator as _bit
            from efficientdet_tpu.train_lib import make_eval_loss_fn

            eval_loss = jax.jit(make_eval_loss_fn(model, tc))
            vals = []
            for vb in _bit(val_ds, args.batch_size, target_size=size,
                           max_gt=args.max_gt, shuffle=False):
                vbatch = {
                    "images": jnp.asarray(vb["images"]),
                    "gt_boxes": jnp.asarray(vb["gt_boxes"]),
                    "gt_labels": jnp.asarray(vb["gt_labels"]),
                }
                vals.append({k: float(v) for k, v in eval_loss(state, vbatch).items()})
                if len(vals) >= 50:
                    break
            if vals:
                vl = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]}
                epoch_metrics.update(vl)
                print(json.dumps({"epoch": epoch, **{k: round(v, 4) for k, v in vl.items()}}), flush=True)
        if val_ds is not None and not args.no_eval and (
            (epoch + 1) % args.eval_every == 0
        ):
            predict = make_sharded_predict_fn(model, mesh)
            eval_params = (
                state.ema_params if state.ema_params is not None else state.params
            )
            variables = {"params": eval_params, "batch_stats": state.batch_stats}
            if args.dataset_type == "coco":
                # reference eval/coco.py Evaluate callback -> COCO AP
                from efficientdet_tpu.evaluation.coco_eval import evaluate_coco

                stats = evaluate_coco(
                    val_ds, predict, variables, size,
                    batch_size=args.batch_size, max_images=500,
                )
                print(json.dumps({"epoch": epoch, **{k: round(v, 4) for k, v in stats.items()}}), flush=True)
                logf.write(json.dumps({"epoch": epoch, **stats}) + "\n")
                epoch_map = stats["AP"]
            else:
                from efficientdet_tpu.evaluation.voc import evaluate_voc, mean_ap

                aps = evaluate_voc(
                    val_ds, predict, variables, size,
                    batch_size=args.batch_size, max_images=500,
                )
                epoch_map = mean_ap(aps)
            epoch_metrics["mAP"] = epoch_map
            print(f"epoch {epoch}: mAP={epoch_map:.4f}", flush=True)
            tb_scalars(int(state.step), epoch_metrics)
            if epoch_map > best_map:
                best_map, bad_epochs = epoch_map, 0
            else:
                bad_epochs += 1
                if bad_epochs >= args.reduce_lr_patience:
                    lr_scale *= args.reduce_lr_factor
                    bad_epochs = 0
                    print(f"ReduceLROnPlateau: lr_scale -> {lr_scale}", flush=True)
                    # lr_scale lives inside TrainState, so dropping the LR is
                    # a scalar write — the compiled step is untouched.
                    state = state.replace(
                        lr_scale=jnp.asarray(lr_scale, jnp.float32)
                    )
        ckpt.save(int(state.step), jax.device_get(state), epoch_metrics)
        t_epoch = time.time()
    logf.close()
    return state


if __name__ == "__main__":
    main()
