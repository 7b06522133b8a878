"""Quantify the fast-eval NMS approximations against the exact path.

The serving EvalConfig enables two approximations (configs.py):
``per_anchor_top_c=16`` and the ``lax.approx_max_k`` anchor prefilter. The
eval CLI uses ``EvalConfig.exact()`` instead; this tool measures what the
fast mode would cost in AP terms, ON TPU (where approx_max_k is genuinely
approximate — on CPU it lowers to an exact sort).

Method: synthetic COCO-style scenes — G "objects" per image induce
clustered high logits on the anchors nearest them (plus noise and a few
adversarial multi-class-hot anchors) — run both configs over the same
logits, score the fast mode's detections with the exact mode's as ground
truth via the repo's own COCOeval, and report AP plus raw agreement.

Usage:  PYTHONPATH=/root/.axon_site python tools/eval_approx_delta.py
        [--images 64] [--classes 90] [--adversarial]
Output: one JSON line; record the number in docs/DESIGN.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--classes", type=int, default=90)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--adversarial", action="store_true",
                   help="add anchors with >16 hot classes (the documented "
                        "fast-mode failure pattern)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientdet_tpu.anchors import anchors_for_shape
    from efficientdet_tpu.configs import EvalConfig, ModelConfig
    from efficientdet_tpu.ops.nms import batched_filter_from_logits

    cfg = ModelConfig.for_phi(0, num_classes=args.classes)
    anchors = np.asarray(
        anchors_for_shape((args.size, args.size), cfg.anchor), np.float32
    )
    A, C = anchors.shape[0], args.classes
    rng = np.random.RandomState(0)

    fast = EvalConfig()
    exact = EvalConfig.exact(C)
    j_anchors = jnp.asarray(anchors)
    run_fast = jax.jit(
        lambda d, l: batched_filter_from_logits(
            j_anchors, d, l, (args.size, args.size), fast
        )
    )
    run_exact = jax.jit(
        lambda d, l: batched_filter_from_logits(
            j_anchors, d, l, (args.size, args.size), exact
        )
    )

    centers = (anchors[:, :2] + anchors[:, 2:]) / 2.0
    agree, total_exact, total_fast = 0, 0, 0
    results_fast, gt_from_exact = [], []
    img_id = 0
    for start in range(0, args.images, args.batch):
        b = min(args.batch, args.images - start)
        logits = rng.normal(-8.0, 1.0, (b, A, C)).astype(np.float32)
        deltas = (0.1 * rng.randn(b, A, 4)).astype(np.float32)
        for i in range(b):
            n_obj = rng.randint(3, 12)
            for _ in range(n_obj):
                cx, cy = rng.uniform(32, args.size - 32, 2)
                cls = rng.randint(0, C)
                d2 = ((centers[:, 0] - cx) ** 2 + (centers[:, 1] - cy) ** 2)
                near = np.argsort(d2)[:24]  # anchors covering the "object"
                logits[i, near, cls] = rng.uniform(1.0, 5.0, near.size)
            if args.adversarial:
                hot_anchor = rng.randint(0, A)
                hot_c = rng.choice(C, 25, replace=False)
                logits[i, hot_anchor, hot_c] = rng.uniform(2.0, 5.0, 25)
        dl, ll = jnp.asarray(deltas), jnp.asarray(logits)
        fb, fs, fc, fn = (np.asarray(x) for x in run_fast(dl, ll))
        eb, es, ec, en = (np.asarray(x) for x in run_exact(dl, ll))
        for i in range(b):
            img_id += 1
            kf, ke = int(fn[i]), int(en[i])
            total_fast += kf
            total_exact += ke
            # raw agreement: identical (box, class) sets
            fset = {
                (tuple(np.round(fb[i, j], 2)), int(fc[i, j]))
                for j in range(kf)
            }
            eset = {
                (tuple(np.round(eb[i, j], 2)), int(ec[i, j]))
                for j in range(ke)
            }
            agree += len(fset & eset)
            for j in range(kf):
                x1, y1, x2, y2 = fb[i, j]
                results_fast.append({
                    "image_id": img_id,
                    "category_id": int(fc[i, j]),
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "score": float(fs[i, j]),
                })
            for j in range(ke):
                x1, y1, x2, y2 = eb[i, j]
                gt_from_exact.append({
                    "id": len(gt_from_exact) + 1,
                    "image_id": img_id,
                    "category_id": int(ec[i, j]),
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "area": float((x2 - x1) * (y2 - y1)),
                    "iscrowd": 0,
                })

    from efficientdet_tpu.evaluation.coco_eval import CocoEvaluator

    ev = CocoEvaluator(
        gt_from_exact,
        image_ids=list(range(1, img_id + 1)),
        category_ids=list(range(C)),
    )
    ev.add_detections(results_fast)
    stats = ev.summarize()
    print(json.dumps({
        "check": "fast_vs_exact_eval_delta",
        "backend": jax.default_backend(),
        "images": img_id,
        "adversarial": bool(args.adversarial),
        "exact_detections": total_exact,
        "fast_detections": total_fast,
        "identical_detections": agree,
        "fast_AP_vs_exact_as_gt": round(stats["AP"], 4),
        "AP_delta": round(1.0 - stats["AP"], 4),
    }))


if __name__ == "__main__":
    main()
