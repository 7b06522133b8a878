"""Standalone evaluation CLI (reference ``eval/common.py`` / ``eval/coco.py``).

The reference evaluates either through the ``Evaluate`` Keras callback during
training or by calling ``eval/common.py:evaluate`` on a loaded model
(SURVEY.md SS2 "VOC-style eval" / "COCO eval", SS3.3-3.4). This module is the
from-a-checkpoint entry point:

    python -m efficientdet_tpu.evaluate coco /data/coco --snapshot ckpts/ \
        --phi 0 [--set val2017] [--max-images N]
    python -m efficientdet_tpu.evaluate pascal /data/VOC2007 --snapshot ... \
        --phi 0 [--set test]
    python -m efficientdet_tpu.evaluate csv annots.csv classes.csv --snapshot ...

COCO prints the 12 COCOeval numbers (self-written 101-pt interpolated AP —
pycocotools is unavailable offline); pascal/csv print per-class VOC AP and
mAP. Detection collection runs through the jitted sharded predict pipeline
(batched, fused preprocess + on-device NMS), unlike the reference's
image-at-a-time ``model.predict`` loop.
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        prog="efficientdet_tpu.evaluate",
        description="Evaluate a checkpoint: COCO AP or VOC-style mAP.",
    )
    sub = p.add_subparsers(dest="dataset_type", required=True)

    coco = sub.add_parser("coco")
    coco.add_argument("coco_path")
    coco.add_argument("--set", dest="eval_set", default="val2017")

    pascal = sub.add_parser("pascal")
    pascal.add_argument("pascal_path")
    pascal.add_argument("--set", dest="eval_set", default="test")

    csv_ = sub.add_parser("csv")
    csv_.add_argument("annotations_path")
    csv_.add_argument("classes_path")

    for q in (coco, pascal, csv_):
        q.add_argument("--snapshot", required=True,
                       help="orbax checkpoint directory (train.py --snapshot-path)")
        q.add_argument("--phi", type=int, default=0, choices=range(8))
        q.add_argument("--weighted-bifpn", action="store_true", default=None,
                       help="force weighted fusion (default: per-phi — "
                            "weighted for D0-D5, unweighted for D6/D7)")
        q.add_argument("--no-weighted-bifpn", dest="weighted_bifpn",
                       action="store_false")
        q.add_argument("--image-size", type=int, default=None)
        q.add_argument("--batch-size", type=int, default=8)
        q.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
        q.add_argument("--score-threshold", type=float, default=0.05,
                       help="COCO collection threshold (reference 0.05)")
        q.add_argument("--iou-threshold", type=float, default=0.5,
                       help="VOC matching IoU (reference 0.5)")
        q.add_argument("--max-images", type=int, default=None)
        q.add_argument("--save-detections", default=None, metavar="PATH",
                       help="also write the detections as a COCO results "
                            "JSON (loadRes/test-dev submission format)")
        q.add_argument("--use-ema", action="store_true",
                       help="evaluate the EMA params if present in the snapshot")
        q.add_argument("--fast-eval", action="store_true",
                       help="enable the serving-path NMS approximations "
                            "(per-anchor class cap + approx_max_k prefilter). "
                            "Default is the parity-EXACT path, as the mAP "
                            "numbers this CLI reports feed the mAP-delta "
                            "parity claim (BASELINE.json:5)")
    return p.parse_args(argv)


def build_dataset(args):
    from efficientdet_tpu.data import CocoDataset, CsvDataset, PascalVocDataset

    if args.dataset_type == "coco":
        return CocoDataset(args.coco_path, args.eval_set)
    if args.dataset_type == "pascal":
        return PascalVocDataset(args.pascal_path, args.eval_set)
    return CsvDataset(args.annotations_path, args.classes_path)


def resolve_model_args(saved_cfg, phi, weighted, image_size, num_classes):
    """Merge the persisted model section of train_config.json with CLI args.

    Saved phi wins (with a warning); weighted_bifpn/image_size fall back to
    the saved values only when the CLI left them unset (None); a
    num_classes mismatch against the eval dataset warns but proceeds.
    """
    if not saved_cfg or "model" not in saved_cfg:
        return phi, weighted, image_size
    m = saved_cfg["model"]
    if m.get("phi") is not None and m["phi"] != phi:
        if phi is not None:  # unset CLI phi is a fallback, not an override
            print(
                f"WARNING: snapshot was trained with phi={m['phi']}; "
                f"using it over --phi {phi}", flush=True,
            )
        phi = m["phi"]
    if weighted is None:
        weighted = m.get("weighted_bifpn")
    if image_size is None:
        image_size = m.get("image_size")
    if m.get("num_classes") not in (None, num_classes):
        print(
            f"WARNING: snapshot num_classes={m['num_classes']} != "
            f"dataset's {num_classes}", flush=True,
        )
    return phi, weighted, image_size


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import efficientdet_tpu as ed
    from efficientdet_tpu.configs import EvalConfig
    from efficientdet_tpu.parallel import make_mesh, make_sharded_predict_fn
    from efficientdet_tpu.train_lib import create_train_state
    from efficientdet_tpu.utils.checkpoint import CheckpointManager

    dataset = build_dataset(args)
    num_classes = dataset.num_classes()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    # The snapshot is self-describing: train.py persists its ModelConfig
    # essentials next to the checkpoints. Saved values take precedence over
    # CLI defaults (a D6 trained with --weighted-bifpn must restore into a
    # weighted template regardless of the per-phi default), with loud
    # warnings when the CLI contradicts them.
    import os as _os

    saved_cfg = None
    cfg_path = _os.path.join(args.snapshot, "train_config.json")
    if _os.path.exists(cfg_path):
        with open(cfg_path) as f:
            saved_cfg = json.load(f)
    phi, weighted, image_size = resolve_model_args(
        saved_cfg, args.phi, args.weighted_bifpn, args.image_size,
        num_classes,
    )
    model, cfg = ed.build_efficientdet(
        phi,
        num_classes=num_classes,
        weighted_bifpn=weighted,
        dtype=dtype,
        image_size=image_size,
    )
    size = cfg.image_size

    # Restore through a TrainState template structurally identical to what
    # train.py saved: a snapshot trained with --grad-accum-steps > 1 carries
    # a MultiSteps-wrapped opt_state and --ema-decay > 0 carries ema_params;
    # a default-TrainConfig template cannot receive either (orbax rejects
    # mismatched pytrees). train.py persists its TrainConfig next to the
    # snapshots for exactly this reason.
    from efficientdet_tpu.configs import train_config_from_snapshot

    tc = train_config_from_snapshot(saved_cfg)
    state = create_train_state(model, tc, jax.random.PRNGKey(0))
    state = CheckpointManager(args.snapshot).restore(state)
    params = (
        state.ema_params
        if args.use_ema and state.ema_params is not None
        else state.params
    )
    variables = {"params": params, "batch_stats": state.batch_stats}

    mesh = make_mesh()
    eval_cfg = (
        EvalConfig() if args.fast_eval else EvalConfig.exact(num_classes)
    )
    predict = make_sharded_predict_fn(model, mesh, eval_config=eval_cfg)
    print(
        f"EfficientDet-D{args.phi} | {size}px | {num_classes} classes | "
        f"{len(dataset)} images | {jax.device_count()} device(s)",
        flush=True,
    )

    if args.dataset_type == "coco":
        from efficientdet_tpu.evaluation.coco_eval import evaluate_coco

        stats = evaluate_coco(
            dataset, predict, variables, size,
            batch_size=args.batch_size,
            score_threshold=args.score_threshold,
            max_images=args.max_images,
            save_detections=args.save_detections,
        )
        print(json.dumps({k: round(v, 4) for k, v in stats.items()}))
    else:
        from efficientdet_tpu.evaluation.voc import evaluate_voc, mean_ap

        aps = evaluate_voc(
            dataset, predict, variables, size,
            batch_size=args.batch_size,
            iou_threshold=args.iou_threshold,
            max_images=args.max_images,
        )
        for label, (ap, n) in sorted(aps.items()):
            print(f"{dataset.label_to_name(label)}: AP={ap:.4f} ({n} gt)")
        print(json.dumps({"mAP": round(mean_ap(aps), 4)}))


if __name__ == "__main__":
    main()
