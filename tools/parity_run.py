"""Weights-day drill: official checkpoint -> COCO AP -> delta vs paper.

ONE command stands between "weights obtained" and "parity number"
(BASELINE.json:5 requires COCO mAP within 0.2 of the reference; SURVEY.md
SS7 hard part #3 notes parity is blocked offline). The moment an official
automl EfficientDet checkpoint becomes available — as an ``.npz`` of
``{tf_name: array}`` (e.g. dumped with
``dict(tf.train.load_checkpoint(p).get_variable_to_shape_map())`` on any
machine with TF, no TF needed HERE) — run:

  python tools/parity_run.py --weights d0.npz --coco-path /data/coco --phi 0

It then (a) loads the archive, (b) ``import_detector(strict=True)`` — full
tree coverage enforced, any automl naming drift fails LOUDLY here, (c) runs
the exact COCO eval over val2017, and (d) prints one JSON line with the AP
and the delta vs the paper table.

The model-shrinking flags (--bifpn-width/--bifpn-depth/--head-depth,
--image-size) exist so ``tests/test_parity_run.py`` can drive this exact
runbook end-to-end on synthetic ``export_detector_tf_style`` weights — the
drill itself is tested, so it cannot rot before weights day.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# EfficientDet paper Table 2 (arXiv 1911.09070) COCO test-dev AP — tagged
# [P-memory] in BASELINE.md; re-verify against the paper when egress exists.
PAPER_AP = {0: 34.6, 1: 40.5, 2: 43.0, 3: 47.5, 4: 49.7, 5: 51.5,
            6: 52.6, 7: 53.7}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--weights", required=True,
                   help=".npz archive of {tf_name: array} official weights")
    p.add_argument("--coco-path", required=True)
    p.add_argument("--set", dest="eval_set", default="val2017")
    p.add_argument("--phi", type=int, default=0, choices=range(8))
    p.add_argument("--num-classes", type=int, default=90,
                   help="automl checkpoints are 90-class")
    p.add_argument("--weighted-bifpn", action="store_true", default=None)
    p.add_argument("--no-weighted-bifpn", dest="weighted_bifpn",
                   action="store_false")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="f32 default: parity first, speed second")
    p.add_argument("--score-threshold", type=float, default=0.001,
                   help="automl eval uses a near-zero threshold")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--save-detections", default=None)
    # test-harness shrink knobs (see module docstring)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--bifpn-width", type=int, default=None)
    p.add_argument("--bifpn-depth", type=int, default=None)
    p.add_argument("--head-depth", type=int, default=None)
    p.add_argument("--paper-ap", type=float, default=None,
                   help="override the paper AP the delta is computed "
                   "against (test harness)")
    return p.parse_args(argv)


def load_tf_archive(path: str) -> dict:
    import numpy as np

    with np.load(path, allow_pickle=False) as z:
        return {k: np.asarray(z[k]) for k in z.files}


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    import efficientdet_tpu as ed
    from efficientdet_tpu.configs import EvalConfig
    from efficientdet_tpu.data import CocoDataset
    from efficientdet_tpu.evaluation.coco_eval import evaluate_coco
    from efficientdet_tpu.parallel import make_mesh, make_sharded_predict_fn
    from efficientdet_tpu.utils.convert import import_detector

    tf_vars = load_tf_archive(args.weights)
    print(f"loaded {len(tf_vars)} variables from {args.weights}", flush=True)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model, cfg = ed.build_efficientdet(
        args.phi, num_classes=args.num_classes,
        weighted_bifpn=args.weighted_bifpn, dtype=dtype,
        image_size=args.image_size,
    )
    shrink = {
        k: v for k, v in (
            ("bifpn_width", args.bifpn_width),
            ("bifpn_depth", args.bifpn_depth),
            ("head_depth", args.head_depth),
        ) if v is not None
    }
    if shrink:
        from efficientdet_tpu.models.detector import EfficientDet

        cfg = dataclasses.replace(cfg, **shrink)
        model = EfficientDet(config=cfg, dtype=dtype)

    size = cfg.image_size
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
    )
    # THE parity gate: strict + full-coverage — a single unmapped or
    # shape-mismatched variable aborts here instead of producing a quietly
    # wrong mAP.
    variables = import_detector(variables, tf_vars, cfg, strict=True)
    print("import_detector: strict full-coverage import ok", flush=True)

    dataset = CocoDataset(args.coco_path, args.eval_set)
    mesh = make_mesh()
    # "exact" must be judged against the MODEL's class space — sizing the
    # per-anchor class cap off the dataset's 80 categories would leave a
    # top-80-of-90 approximation inside the one tool whose contract is
    # no approximations.
    eval_cfg = EvalConfig.exact(cfg.num_classes)
    predict = make_sharded_predict_fn(model, mesh, eval_config=eval_cfg)

    # Official automl checkpoints classify over the 90-id COCO space
    # (category_id = label + 1); the dataset's own mapping is contiguous
    # over its 80 actual categories. When the class counts differ, use the
    # automl convention and drop labels whose id has no annotations.
    label_to_cat = None
    if cfg.num_classes != dataset.num_classes():
        valid = set(dataset.cat_ids)
        label_to_cat = {
            lab: lab + 1 for lab in range(cfg.num_classes)
            if (lab + 1) in valid
        }
        print(
            f"label map: automl 90-id convention (label+1); "
            f"{len(label_to_cat)}/{cfg.num_classes} labels have annotated "
            f"categories", flush=True,
        )

    # the sharded predict splits the batch over the data mesh axis; round
    # the batch up so it divides (partial final batches are padded anyway)
    n_dev = jax.device_count()
    batch_size = -(-args.batch_size // n_dev) * n_dev
    if batch_size != args.batch_size:
        print(f"batch_size {args.batch_size} -> {batch_size} "
              f"(multiple of {n_dev} devices)", flush=True)

    stats = evaluate_coco(
        dataset, predict, variables, size,
        batch_size=batch_size,
        score_threshold=args.score_threshold,
        max_images=args.max_images,
        save_detections=args.save_detections,
        label_to_cat=label_to_cat,
    )
    ap = 100.0 * stats.get("AP", float("nan"))
    paper = args.paper_ap if args.paper_ap is not None else PAPER_AP[args.phi]
    print(
        json.dumps(
            {
                "event": "parity",
                "phi": args.phi,
                "AP": round(ap, 2),
                "paper_AP": paper,
                "delta": round(ap - paper, 2),
                "within_0.2": bool(abs(ap - paper) <= 0.2),
                "images": len(dataset) if args.max_images is None
                else min(args.max_images, len(dataset)),
                "stats": {k: round(v, 4) for k, v in stats.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
