"""Inference API + demo CLI (reference ``inference.py``, SURVEY.md SS3.2).

Public API::

    predictor = Predictor(phi=0, num_classes=90)        # random init
    predictor = Predictor.from_checkpoint(path, phi=0)  # orbax params
    boxes, scores, classes = predictor(image)           # one RGB uint8 image

The whole pipeline — aspect-preserving resize, pad-to-square, normalise,
backbone/BiFPN/heads, box decode, clip, per-class NMS — runs as ONE jitted
XLA program per source-image shape; only JPEG decode and the final
boxes/scale division happen on the host (north star, BASELINE.json:5).

CLI::

    python -m efficientdet_tpu.predict --phi 0 --checkpoint ckpt/ \
        --image in.jpg --output out.png --score-threshold 0.3
"""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import numpy as np


class Predictor:
    """Single-image / small-batch detection with per-shape jit caching."""

    def __init__(
        self,
        phi: int = 0,
        num_classes: int = 90,
        weighted_bifpn: bool | None = None,
        score_threshold: float = 0.01,
        nms_iou_threshold: float = 0.5,
        max_detections: int = 100,
        dtype: str = "f32",
        variables=None,
        image_size: Optional[int] = None,
        seed: int = 0,
    ):
        import jax
        import jax.numpy as jnp

        import efficientdet_tpu as ed
        from efficientdet_tpu.configs import EvalConfig

        self._jnp = jnp
        self._jax = jax
        jdtype = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        self.model, self.config = ed.build_efficientdet(
            phi,
            num_classes=num_classes,
            weighted_bifpn=weighted_bifpn,
            dtype=jdtype,
            image_size=image_size,
        )
        self.eval_config = EvalConfig(
            score_threshold=score_threshold,
            nms_iou_threshold=nms_iou_threshold,
            max_detections=max_detections,
        )
        if variables is None:
            size = self.config.image_size
            variables = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3))
            )
        self.variables = variables
        # Per-INSTANCE jit cache keyed on source shape. (An lru_cache on the
        # bound method would pin `self` — params included — in a global
        # cache for the process lifetime and alias across instances.)
        self._run_cache: dict = {}

    @classmethod
    def from_checkpoint(cls, path: str, **kwargs) -> "Predictor":
        """Load weights from either a params-only checkpoint (save_params)
        or a train.py snapshot directory (CheckpointManager
        layout with numbered steps — params + batch_stats are partially
        restored, no optimizer template needed), so `train.py
        --snapshot-path DIR` then `predict.py --checkpoint DIR` just works.
        """
        import os

        from efficientdet_tpu.utils.checkpoint import (
            CheckpointManager,
            load_params,
        )

        p = cls(**kwargs)
        template = p._jax.tree.map(np.asarray, p.variables)
        is_manager_dir = os.path.isdir(path) and any(
            s.isdigit() for s in os.listdir(path)
        )
        if is_manager_dir:
            p.variables = CheckpointManager(path).restore_partial(template)
        else:
            p.variables = load_params(path, template)
        return p

    def _compiled(self, h: int, w: int):
        """One fused program per source shape: preprocess+model+decode+NMS."""
        cached = self._run_cache.get((h, w))
        if cached is not None:
            return cached
        import jax
        import jax.numpy as jnp

        from efficientdet_tpu.anchors import anchors_for_shape
        from efficientdet_tpu.ops.nms import filter_detections_from_logits
        from efficientdet_tpu.ops.preprocess import preprocess_image

        size = self.config.image_size
        anchors = jnp.asarray(anchors_for_shape((size, size), self.config.anchor))
        ec = self.eval_config

        @jax.jit
        def run(variables, image):
            x, scale = preprocess_image(image, size, dtype=self.model.dtype)
            cls_logits, box_deltas = self.model.apply(
                variables, x[None], train=False
            )
            b, s, c, n = filter_detections_from_logits(
                anchors,
                box_deltas[0],
                cls_logits[0],
                (size, size),
                ec.score_threshold,
                ec.nms_iou_threshold,
                ec.max_detections,
                ec.pre_nms_top_k,
            )
            return b / scale, s, c, n

        if len(self._run_cache) >= 8:  # bound the per-shape program cache
            self._run_cache.pop(next(iter(self._run_cache)))
        self._run_cache[(h, w)] = run
        return run

    def __call__(
        self, image: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(H, W, 3) RGB uint8 -> (boxes xyxy in source pixels, scores, classes),
        truncated to the valid detections."""
        h, w = image.shape[:2]
        run = self._compiled(h, w)
        b, s, c, n = run(self.variables, self._jnp.asarray(image))
        n = int(n)
        return np.asarray(b)[:n], np.asarray(s)[:n], np.asarray(c)[:n]


def main(argv=None):
    p = argparse.ArgumentParser(description="EfficientDet inference demo.")
    p.add_argument("--phi", type=int, default=0, choices=range(8))
    p.add_argument("--checkpoint", default=None, help="orbax params dir")
    p.add_argument("--image", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--num-classes", type=int, default=90)
    p.add_argument("--score-threshold", type=float, default=0.3)
    args = p.parse_args(argv)

    from efficientdet_tpu.utils.image import draw_detections, read_image_rgb

    if args.checkpoint:
        predictor = Predictor.from_checkpoint(
            args.checkpoint, phi=args.phi, num_classes=args.num_classes
        )
    else:
        predictor = Predictor(phi=args.phi, num_classes=args.num_classes)
        print("warning: no --checkpoint, using random weights")

    image = read_image_rgb(args.image)
    boxes, scores, classes = predictor(image)
    keep = scores >= args.score_threshold
    print(f"{int(keep.sum())} detections >= {args.score_threshold}")
    for b, s, c in zip(boxes[keep], scores[keep], classes[keep]):
        print(f"  class={int(c):3d} score={s:.3f} box={np.round(b, 1).tolist()}")
    if args.output:
        out = draw_detections(
            image, boxes, scores, classes, score_threshold=args.score_threshold
        )
        from PIL import Image

        Image.fromarray(out).save(args.output)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
