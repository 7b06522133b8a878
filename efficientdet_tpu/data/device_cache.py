"""Device-resident data cache: keep letterboxed images in HBM, gather
batches on-device, augment on-device.

Why this exists (measured, docs/DESIGN.md §6k): the sustained host→device
link can be the training bottleneck — on the tunneled single-chip bench
environment it throttles to ~95 MB/s while the D0/b128 step consumes
100.7 MB every 243 ms (~414 MB/s), capping pipeline-fed training at
74 img/s against the chip's 526. Production hosts have PCIe, but the same
shape of problem recurs at pod scale (many chips per host NIC) and for
storage-bound readers. Two standard TPU-practice answers, both independent
of the reference's host-side ``fit_generator`` design:

* **Device-resident cache** (this module): letterbox once on the host,
  upload the whole dataset (or a window of it) to HBM as uint8, then each
  step gathers its batch BY INDICES — a few hundred bytes of H2D — and the
  train step's fused device augmenter (``ops/augment.py``, enabled with
  ``TrainConfig.device_augment``) provides the per-epoch randomness that
  host-side augmentation would have. COCO-2017 train at 512 px uint8 is
  ~92 GB and does not fit one chip's HBM; a fine-tune dataset, a CSV
  dataset, or a streaming window of a big one does (10k images ≈ 7.9 GB,
  2k ≈ 1.6 GB).
* **Data echoing** (Choi et al. 2019, "Faster Neural Network Training with
  Data Echoing") for datasets that do NOT fit: re-use each uploaded batch
  E times with E different device augmentations. Implemented in the train
  loop / bench (``tools/bench_train.py --echo``), not here — echoing is a
  property of how the iterator is consumed, not of storage.

The pool is sharded along the image axis over the mesh's ``data`` axis, so
per-device HBM cost is N/ndev images; the jitted gather emits the batch
already in the train step's expected sharding (XLA inserts the collective
for cross-shard picks — on a single chip it is a local dynamic-gather).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from efficientdet_tpu.data.common import DetectionDataset, letterbox_hostside


class DeviceDataCache:
    """Letterboxed dataset resident in device memory.

    Args:
      dataset: any ``DetectionDataset``.
      target_size: canvas size S (images stored as (N, S, S, 3) uint8).
      max_gt: GT padding per image (reference semantics: -1 labels).
      mesh: optional ``jax.sharding.Mesh``; the pool is sharded along its
        ``data`` axis and gathered batches come out batch-sharded the same
        way (drop-in for ``parallel.shard_batch`` output). ``None`` = the
        default device.
      limit: cache only the first ``limit`` images (a window of a big
        dataset). ``len(dataset)`` must be padded to a multiple of the
        data-axis size by the caller only in the exotic case of tiny
        datasets on big meshes; normally the pool pads itself by wrapping.
      upload_chunk: images per host→device transfer while building the
        pool (bounds host staging RAM; the relay's burst window likes
        moderate chunks).
    """

    def __init__(
        self,
        dataset: DetectionDataset,
        target_size: int,
        max_gt: int = 100,
        mesh=None,
        limit: Optional[int] = None,
        upload_chunk: int = 256,
    ):
        n = len(dataset) if limit is None else min(limit, len(dataset))
        if n == 0:
            raise ValueError("empty dataset")
        self.target_size = int(target_size)
        self.max_gt = int(max_gt)
        self.mesh = mesh

        ndev = 1
        if mesh is not None:
            ndev = mesh.shape.get("data", 1)
        # pad by wrapping so the pool shards evenly; sampling uses
        # self.n (real count) so wrapped duplicates only fill shard slack
        self._n_padded = -(-n // ndev) * ndev
        self.n = n

        pool_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            pool_sharding = NamedSharding(mesh, PartitionSpec("data"))

        # host pass: letterbox + target prep, uploaded in bounded chunks
        device_chunks = {"images": [], "gt_boxes": [], "gt_labels": [],
                         "extents": [], "scales": []}
        s = self.target_size
        for start in range(0, self._n_padded, upload_chunk):
            count = min(upload_chunk, self._n_padded - start)
            images = np.zeros((count, s, s, 3), np.uint8)
            gt_boxes = np.zeros((count, max_gt, 4), np.float32)
            gt_labels = np.full((count, max_gt), -1, np.int32)
            extents = np.zeros((count, 2), np.float32)
            scales = np.zeros((count,), np.float32)
            for i in range(count):
                di = (start + i) % n  # wrap-pad
                img = dataset.load_image(di)
                boxes, labels = dataset.load_annotations(di)
                boxes, labels = dataset.filter_annotations(
                    boxes, labels, img.shape[:2]
                )
                canvas, scale = letterbox_hostside(img, s)
                images[i] = canvas
                scales[i] = scale
                h, w = img.shape[:2]
                extents[i] = (int(round(h * scale)), int(round(w * scale)))
                k = min(len(boxes), max_gt)
                if k:
                    gt_boxes[i, :k] = boxes[:k] * scale
                    gt_labels[i, :k] = labels[:k]
            chunk = {"images": images, "gt_boxes": gt_boxes,
                     "gt_labels": gt_labels, "extents": extents,
                     "scales": scales}
            for key, val in chunk.items():
                device_chunks[key].append(jax.device_put(val))
        # concatenate ON DEVICE (host never holds the full pool), then lay
        # out with the pool sharding
        pool = {k: jnp.concatenate(v, axis=0)
                for k, v in device_chunks.items()}
        if pool_sharding is not None:
            pool = {k: jax.device_put(v, pool_sharding)
                    for k, v in pool.items()}
        self._pool = pool

        batch_sharding = None
        if mesh is not None:
            from efficientdet_tpu.parallel.sharding import data_sharding

            batch_sharding = data_sharding(mesh)

        def gather(pool, idx):
            return {k: jnp.take(v, idx, axis=0) for k, v in pool.items()}

        self._gather = jax.jit(
            gather,
            out_shardings=(batch_sharding if batch_sharding is not None
                           else None),
        )

    def __len__(self) -> int:
        return self.n

    def nbytes(self) -> int:
        """Total pool bytes across devices."""
        return sum(int(v.size) * v.dtype.itemsize
                   for v in self._pool.values())

    def get_batch(self, indices: np.ndarray) -> Dict[str, jax.Array]:
        """Gather a batch by dataset indices — H2D is just the indices."""
        idx = jnp.asarray(np.asarray(indices, np.int32))
        return self._gather(self._pool, idx)

    def batches(
        self,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        repeat: bool = True,
        drop_last: bool = True,
    ) -> Iterator[Dict[str, jax.Array]]:
        """Epoch iterator mirroring ``batch_iterator``'s order semantics.

        Yields device batches (images uint8 + gt + extents) ready for a
        train step built with ``TrainConfig.device_augment=True`` — the
        augmentation that the host path would have applied per epoch runs
        inside the step's XLA program instead, so cached epochs are not
        literal repeats.
        """
        if batch_size > self.n and drop_last:
            raise ValueError(
                f"batch_size {batch_size} > cached images {self.n} with "
                "drop_last=True would yield no batches (use "
                "drop_last=False to wrap-pad)"
            )
        rng = np.random.RandomState(seed)
        while True:
            order = np.arange(self.n)
            if shuffle:
                rng.shuffle(order)
            for start in range(0, self.n, batch_size):
                chunk = order[start:start + batch_size]
                if len(chunk) < batch_size:
                    if drop_last or len(chunk) == 0:
                        continue
                    reps = -(-batch_size // len(chunk))
                    chunk = np.tile(chunk, reps)[:batch_size]
                yield self.get_batch(chunk)
            if not repeat:
                break
