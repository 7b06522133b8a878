"""Dataset base class and the host->device batch pipeline.

Rebuild of the reference's ``generators/common.py`` ``Generator``
(SURVEY.md SS2 "Data generators"), redesigned for the TPU execution model:

* The reference did resize/pad/normalise *and* anchor matching per item on
  the host (Cython IoU). Here the host does only what XLA cannot: file IO,
  JPEG decode, and (optional) cv2 augmentation on uint8 images. Resize,
  pad-to-square, normalisation run fused on-device
  (``ops.preprocess.preprocess_image``) and anchor matching happens inside
  the jitted train step (``anchors.anchor_targets_batch``).
* Batches are fixed-shape dicts (images, gt_boxes padded to ``max_gt``,
  gt_labels with -1 padding) so one XLA program serves every step.

Annotation filtering mirrors the reference: boxes are clipped to the image
and degenerate boxes (x2<=x1, y2<=y1) dropped.
"""

from __future__ import annotations

import abc
from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np


class DetectionDataset(abc.ABC):
    """Abstract dataset: images + xyxy box annotations with integer labels."""

    @abc.abstractmethod
    def __len__(self) -> int:
        ...

    @abc.abstractmethod
    def load_image(self, index: int) -> np.ndarray:
        """(H, W, 3) RGB uint8."""

    @abc.abstractmethod
    def load_annotations(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """((N, 4) float32 xyxy, (N,) int32 labels)."""

    @abc.abstractmethod
    def num_classes(self) -> int:
        ...

    def label_to_name(self, label: int) -> str:
        return str(label)

    def image_id(self, index: int) -> int:
        """Stable id for eval bookkeeping (COCO image id where applicable)."""
        return index

    def image_aspect_ratio(self, index: int) -> float:
        img = self.load_image(index)
        h, w = img.shape[:2]
        return w / h

    def filter_annotations(
        self, boxes: np.ndarray, labels: np.ndarray, hw: Tuple[int, int]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Clip to image and drop degenerate boxes (reference behaviour)."""
        h, w = hw
        if len(boxes) == 0:
            return boxes.reshape(0, 4).astype(np.float32), labels.astype(np.int32)
        boxes = boxes.astype(np.float32).copy()
        boxes[:, 0] = np.clip(boxes[:, 0], 0, w - 1)
        boxes[:, 1] = np.clip(boxes[:, 1], 0, h - 1)
        boxes[:, 2] = np.clip(boxes[:, 2], 0, w - 1)
        boxes[:, 3] = np.clip(boxes[:, 3], 0, h - 1)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        return boxes[keep], labels[keep].astype(np.int32)


def letterbox_hostside(
    image: np.ndarray, target_size: int
) -> Tuple[np.ndarray, float]:
    """Host (numpy) aspect-preserving resize + pad, for the batching path.

    The single-image predict path uses the fused on-device
    ``ops.preprocess.preprocess_image`` instead; this host variant exists so
    a *batch* of differently-sized images can be assembled into one
    fixed-shape uint8 tensor that is then normalised on-device in one fused
    program (avoiding one XLA compilation per unique source shape).
    """
    import cv2

    h, w = image.shape[:2]
    scale = target_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((target_size, target_size, 3), image.dtype)
    canvas[:nh, :nw] = resized
    return canvas, scale


def batch_iterator(
    dataset: DetectionDataset,
    batch_size: int,
    target_size: int,
    max_gt: int = 100,
    shuffle: bool = True,
    repeat: bool = False,
    augment: Optional[Callable] = None,
    seed: int = 0,
    group_by_aspect: bool = False,
    drop_last: bool = True,
    workers: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield fixed-shape training/eval batches.

    Each batch dict has:
      images: (B, S, S, 3) uint8 letterboxed (normalise on-device),
      gt_boxes: (B, max_gt, 4) float32 in model-input coords,
      gt_labels: (B, max_gt) int32, -1 padded,
      scales: (B,) float32 letterbox scale per image,
      indices: (B,) int32 dataset indices.

    ``workers > 0`` decodes/augments/letterboxes the batch's images in a
    thread pool (cv2/PIL release the GIL) — the analog of the reference's
    ``fit_generator`` multiprocessing workers. Augmentation then draws from
    per-image seeds (derived from the iterator RNG) instead of one shared
    sequential stream, so augmented pixel streams differ from ``workers=0``
    while remaining deterministic for a given seed.

    ``shard_count > 1`` partitions each epoch's (shuffled) order across
    processes for multi-HOST data parallelism: pass
    ``shard_index=jax.process_index(), shard_count=jax.process_count()``
    and every host iterates a disjoint slice of the same permutation (the
    seed fixes the permutation, so hosts agree without communicating);
    per-host batches then assemble into the global array via
    ``jax.make_array_from_process_local_data`` (tools/multiprocess_dryrun).
    """
    if batch_size > len(dataset) // shard_count and drop_last and repeat:
        raise ValueError(
            f"batch_size {batch_size} > per-shard dataset size "
            f"{len(dataset) // shard_count} with drop_last=True: the "
            "repeat loop would spin forever yielding nothing (use "
            "drop_last=False to wrap-pad small datasets)"
        )
    if not (0 <= shard_index < shard_count):
        raise ValueError(
            f"shard_index {shard_index} not in [0, {shard_count})"
        )
    rng = np.random.RandomState(seed)
    n = len(dataset)
    pool = None
    if workers > 0:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=workers)

    # Aspect ratios are immutable per dataset: compute the sorted base
    # order ONCE, not per epoch — the base implementation decodes the full
    # image to get its ratio, so an in-loop recompute stalled every epoch
    # start by n decodes (round-3 review finding).
    aspect_base_order = None
    if group_by_aspect:
        ratios = np.asarray([dataset.image_aspect_ratio(i) for i in range(n)])
        aspect_base_order = np.argsort(ratios, kind="stable")

    def shard_evenly(arr):
        """Strided shard with EQUAL length on every process.

        ``arr[shard_index::shard_count]`` alone gives lengths differing by
        one, so hosts would yield different batch counts and a collective
        train/eval loop would desynchronise (one host enters a step the
        others never join). Trimming to a multiple of shard_count drops
        <= shard_count-1 trailing elements per epoch; shuffling rotates
        which ones.
        """
        usable = (len(arr) // shard_count) * shard_count
        return arr[:usable][shard_index::shard_count]

    def order():
        idx = np.arange(n)
        if group_by_aspect:
            idx = aspect_base_order.copy()
        if shuffle:
            if group_by_aspect:
                # shuffle whole batches to keep aspect grouping
                nb = len(idx) // batch_size
                groups = idx[: nb * batch_size].reshape(nb, batch_size)
                rng.shuffle(groups)
                idx = np.concatenate([groups.reshape(-1), idx[nb * batch_size:]])
            else:
                rng.shuffle(idx)
        if shard_count > 1:
            if group_by_aspect:
                # stride over whole BATCHES, not elements: an element
                # stride would interleave different aspect groups and
                # silently undo the grouping just computed
                nb = len(idx) // batch_size
                groups = idx[: nb * batch_size].reshape(nb, batch_size)
                tail = idx[nb * batch_size:]
                idx = np.concatenate(
                    [shard_evenly(groups).reshape(-1), shard_evenly(tail)]
                )
            else:
                # strided, not contiguous: every shard sees the whole
                # dataset's distribution within an epoch even when
                # n % shard_count != 0
                idx = shard_evenly(idx)
        return idx

    while True:
        idx = order()
        for start in range(0, len(idx), batch_size):
            chunk = idx[start : start + batch_size]
            if len(chunk) < batch_size:
                if drop_last or len(chunk) == 0:
                    continue
                # wrap-pad: TILE the remainder up to a full batch — a
                # single doubling under-fills whenever the remainder is
                # less than half the batch (round-3 review finding,
                # verified: n=10, B=8 yielded a length-4 final batch)
                reps = -(-batch_size // len(chunk))
                chunk = np.tile(chunk, reps)[:batch_size]
            images = np.zeros((batch_size, target_size, target_size, 3), np.uint8)
            gt_boxes = np.zeros((batch_size, max_gt, 4), np.float32)
            gt_labels = np.full((batch_size, max_gt), -1, np.int32)
            scales = np.zeros((batch_size,), np.float32)
            # (scaled_h, scaled_w) visible-image extent per canvas; the
            # device-augment path clips transformed boxes against this
            # (ops/augment.py) exactly as the host paths below do.
            extents = np.zeros((batch_size, 2), np.float32)

            def load_one(bi, di, aug_seed):
                img = dataset.load_image(int(di))
                boxes, labels = dataset.load_annotations(int(di))
                boxes, labels = dataset.filter_annotations(
                    boxes, labels, img.shape[:2]
                )
                if augment is not None:
                    aug_rng = (
                        rng if aug_seed is None
                        else np.random.RandomState(aug_seed)
                    )
                    if getattr(augment, "supports_fused_letterbox", False):
                        # fused warp+letterbox: one resample into the canvas,
                        # boxes come back already in canvas coords
                        canvas, boxes, scale = augment(
                            aug_rng, img, boxes, target_size=target_size
                        )
                        # Clip to the SCALED IMAGE extent, not the square
                        # canvas: for non-square images the canvas includes
                        # zero letterbox padding, and boxes pushed past the
                        # short edge by the random transform must be clipped
                        # to the visible image (or dropped as degenerate)
                        # like the non-fused path does.
                        h_img, w_img = img.shape[:2]
                        extent = (
                            int(round(h_img * scale)),
                            int(round(w_img * scale)),
                        )
                        boxes, labels = dataset.filter_annotations(
                            boxes, labels, extent
                        )
                        images[bi] = canvas
                        scales[bi] = scale
                        extents[bi] = extent
                        k = min(len(boxes), max_gt)
                        if k:
                            gt_boxes[bi, :k] = boxes[:k]
                            gt_labels[bi, :k] = labels[:k]
                        return
                    img, boxes = augment(aug_rng, img, boxes)
                    boxes, labels = dataset.filter_annotations(
                        boxes, labels, img.shape[:2]
                    )
                canvas, scale = letterbox_hostside(img, target_size)
                images[bi] = canvas
                scales[bi] = scale
                h_img, w_img = img.shape[:2]
                extents[bi] = (
                    int(round(h_img * scale)),
                    int(round(w_img * scale)),
                )
                k = min(len(boxes), max_gt)
                if k:
                    gt_boxes[bi, :k] = boxes[:k] * scale
                    gt_labels[bi, :k] = labels[:k]

            if pool is not None:
                seeds = rng.randint(0, 2**31 - 1, size=len(chunk))
                list(pool.map(load_one, range(len(chunk)), chunk, seeds))
            else:
                for bi, di in enumerate(chunk):
                    load_one(bi, di, None)
            yield {
                "images": images,
                "gt_boxes": gt_boxes,
                "gt_labels": gt_labels,
                "scales": scales,
                "extents": extents,
                "indices": chunk.astype(np.int32),
            }
        if not repeat:
            break


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Run ``iterator`` in a background thread, buffering ``size`` batches.

    The reference overlapped host data work with device steps via Keras
    ``fit_generator`` multiprocessing workers; a single prefetch thread is
    the TPU-side equivalent (the device step is one jitted call, so the host
    thread has the whole step duration to prepare the next batch — measured
    host letterboxing for a 32x512px batch is comparable to the D0 train
    step itself).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    class _Raise:
        """Carrier for a worker exception — re-raised in the consumer.

        Without it, a mid-epoch error (e.g. one corrupt JPEG) killed the
        worker thread, the finally-clause _END made the stream look like a
        normal end-of-dataset, and training/eval silently stopped early
        with exit code 0 (round-3 review finding)."""

        def __init__(self, exc):
            self.exc = exc

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — must reach the consumer
            q.put(_Raise(e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, _Raise):
            raise item.exc
        yield item
