"""Host input-pipeline throughput microbench.

Measures images/sec through ``data.common.batch_iterator`` (decode skipped —
synthetic in-memory images — so this isolates letterbox + augment + target
assembly + batch assembly, the per-step host work that must keep up with the
device). Compare against the device train-step img/s/chip (tools/
bench_train.py): if this number is lower, training is host-bound on this
machine and ``--workers``/``--device-augment`` are the levers.

Usage: python tools/bench_data.py [--batch 32] [--size 512] [--images 256]
       [--augment {none,host,fused}] [--workers N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class SyntheticDataset:
    """In-memory dataset with reference-Generator-shaped hooks."""

    def __init__(self, n, hw=(480, 640), num_classes=20, seed=0):
        rng = np.random.RandomState(seed)
        self._images = [
            rng.randint(0, 256, (hw[0], hw[1], 3), np.uint8) for _ in range(8)
        ]
        self._n = n
        self._boxes = [
            np.stack(
                [
                    rng.uniform(0, hw[1] // 2, 6),
                    rng.uniform(0, hw[0] // 2, 6),
                    rng.uniform(hw[1] // 2, hw[1], 6),
                    rng.uniform(hw[0] // 2, hw[0], 6),
                ],
                axis=1,
            ).astype(np.float32)
            for _ in range(8)
        ]
        self._nc = num_classes

    def __len__(self):
        return self._n

    def num_classes(self):
        return self._nc

    def load_image(self, i):
        return self._images[i % 8]

    def load_annotations(self, i):
        boxes = self._boxes[i % 8]
        labels = np.arange(len(boxes)) % self._nc
        return boxes.copy(), labels.astype(np.int64)

    def filter_annotations(self, boxes, labels, hw):
        h, w = hw
        boxes = boxes.copy()
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
        keep = (boxes[:, 2] - boxes[:, 0] >= 1) & (boxes[:, 3] - boxes[:, 1] >= 1)
        return boxes[keep], labels[keep]

    def image_aspect_ratio(self, i):
        img = self._images[i % 8]
        return img.shape[1] / img.shape[0]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--augment", default="none",
                   choices=["none", "host", "fused"])
    p.add_argument("--workers", type=int, default=0)
    args = p.parse_args()

    from efficientdet_tpu.data.common import batch_iterator

    augment = None
    if args.augment != "none":
        from efficientdet_tpu.data.augment import make_augmenter

        augment = make_augmenter()
        if args.augment == "host":
            # plain (rng, image, boxes) path — disable the fused
            # warp+letterbox shortcut so the separate-letterbox cost shows
            augment.supports_fused_letterbox = False

    ds = SyntheticDataset(args.images)
    it = batch_iterator(
        ds, args.batch, target_size=args.size, shuffle=True, repeat=True,
        augment=augment, workers=args.workers,
    )
    n_warm = 2
    for _ in range(n_warm):
        next(it)
    steps = max(args.images // args.batch, 4)
    t0 = time.perf_counter()
    for _ in range(steps):
        b = next(it)
    dt = time.perf_counter() - t0
    assert b["images"].shape == (args.batch, args.size, args.size, 3)
    print(
        json.dumps(
            {
                "metric": "host_pipeline_throughput",
                "value": round(steps * args.batch / dt, 1),
                "unit": "img/s",
                "augment": args.augment,
                "workers": args.workers,
                "batch": args.batch,
                "size": args.size,
            }
        )
    )


if __name__ == "__main__":
    main()
