"""Device-resident data cache (data/device_cache.py, DESIGN.md §6k).

The cache must be a drop-in replacement for the host pipeline's
``batch_iterator`` + ``shard_batch`` output: identical letterboxed pixels,
identical scaled GT, identical padding semantics — only the storage (HBM)
and the per-step H2D (indices instead of 100 MB of pixels) differ.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientdet_tpu.data import DeviceDataCache, batch_iterator
from efficientdet_tpu.data.common import DetectionDataset
from efficientdet_tpu.parallel import make_mesh


class TinyDataset(DetectionDataset):
    """Deterministic images of varying sizes with one box each."""

    def __init__(self, n=10, num_classes=4):
        self._n = n
        self._nc = num_classes

    def __len__(self):
        return self._n

    def num_classes(self):
        return self._nc

    def load_image(self, i):
        h, w = 40 + 8 * (i % 3), 64 - 8 * (i % 2)
        rng = np.random.RandomState(i)
        return rng.randint(0, 256, (h, w, 3), np.uint8)

    def load_annotations(self, i):
        img = self.load_image(i)
        h, w = img.shape[:2]
        boxes = np.array([[4.0, 4.0, w - 4.0, h - 4.0]], np.float32)
        return boxes, np.array([i % self._nc], np.int64)


@pytest.fixture(scope="module")
def cache_and_host():
    ds = TinyDataset(10)
    cache = DeviceDataCache(ds, target_size=64, max_gt=5, upload_chunk=4)
    host = next(
        batch_iterator(ds, 10, target_size=64, max_gt=5, shuffle=False)
    )
    return ds, cache, host


class TestContentParity:
    def test_matches_host_pipeline(self, cache_and_host):
        _, cache, host = cache_and_host
        b = cache.get_batch(np.arange(10))
        np.testing.assert_array_equal(np.asarray(b["images"]),
                                      host["images"])
        np.testing.assert_allclose(np.asarray(b["gt_boxes"]),
                                   host["gt_boxes"], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(b["gt_labels"]),
                                      host["gt_labels"])
        np.testing.assert_allclose(np.asarray(b["extents"]),
                                   host["extents"])
        np.testing.assert_allclose(np.asarray(b["scales"]),
                                   host["scales"])

    def test_gather_arbitrary_order(self, cache_and_host):
        _, cache, host = cache_and_host
        idx = np.array([7, 2, 2, 9], np.int32)
        b = cache.get_batch(idx)
        np.testing.assert_array_equal(np.asarray(b["images"]),
                                      host["images"][idx])
        np.testing.assert_array_equal(np.asarray(b["gt_labels"]),
                                      host["gt_labels"][idx])

    def test_nbytes_accounts_pool(self, cache_and_host):
        _, cache, _ = cache_and_host
        # images dominate: 10 * 64*64*3 = 122880 uint8
        assert cache.nbytes() >= 10 * 64 * 64 * 3


class TestShardedPool:
    def test_sharded_gather_matches_unsharded(self):
        ds = TinyDataset(16)
        mesh = make_mesh()
        plain = DeviceDataCache(ds, target_size=64, max_gt=5)
        sharded = DeviceDataCache(ds, target_size=64, max_gt=5, mesh=mesh)
        idx = np.array([3, 14, 0, 9, 9, 1, 12, 5], np.int32)
        a = plain.get_batch(idx)
        b = sharded.get_batch(idx)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))
        # batch comes out sharded along the data axis for the train step
        shard_devs = {s.device for s in b["images"].addressable_shards}
        assert len(shard_devs) == 8

    def test_wrap_pad_tiny_dataset_on_mesh(self):
        # 5 images on an 8-way data axis: pool pads by wrapping, but
        # sampling only ever uses real indices 0..4
        ds = TinyDataset(5)
        mesh = make_mesh()
        cache = DeviceDataCache(ds, target_size=64, max_gt=5, mesh=mesh)
        assert len(cache) == 5
        # batch > n with drop_last would never yield — guarded:
        with pytest.raises(ValueError, match="drop_last"):
            next(cache.batches(8, shuffle=True, seed=0))
        batch = next(cache.batches(8, shuffle=True, seed=0,
                                   drop_last=False))
        assert int(np.asarray(batch["gt_labels"]).max()) <= 4
        # all sampled indices are real images (labels are i % 4, images
        # deterministic) — check one gathered image against the dataset
        b0 = np.asarray(batch["images"][0])
        assert b0.shape == (64, 64, 3)

    def test_limit_window(self):
        ds = TinyDataset(10)
        cache = DeviceDataCache(ds, target_size=64, max_gt=5, limit=4)
        assert len(cache) == 4
        seen = set()
        it = cache.batches(2, shuffle=True, seed=1, repeat=False)
        for b in it:
            seen.update(np.asarray(b["gt_labels"])[:, 0].tolist())
        # labels are i % 4 over window 0..3
        assert seen == {0, 1, 2, 3}


class TestEpochSemantics:
    def test_epoch_covers_dataset_once(self):
        ds = TinyDataset(8, num_classes=8)
        cache = DeviceDataCache(ds, target_size=64, max_gt=5)
        labels = []
        for b in cache.batches(4, shuffle=True, seed=0, repeat=False):
            labels.extend(np.asarray(b["gt_labels"])[:, 0].tolist())
        assert sorted(labels) == list(range(8))

    def test_wrap_pad_final_batch(self):
        ds = TinyDataset(6, num_classes=6)
        cache = DeviceDataCache(ds, target_size=64, max_gt=5)
        batches = list(cache.batches(4, shuffle=False, repeat=False,
                                     drop_last=False))
        assert len(batches) == 2
        assert batches[1]["images"].shape[0] == 4  # tiled up to full


class TestTrainStepIntegration:
    def test_device_augment_step_consumes_cache_batch(self, slim_d0):
        """One sharded train step fed from the cache, augment on device."""
        import dataclasses

        from efficientdet_tpu.configs import TrainConfig
        from efficientdet_tpu.parallel import (
            make_mesh,
            make_sharded_train_step,
        )
        from efficientdet_tpu.train_lib import create_train_state

        model, cfg, _ = slim_d0
        mesh = make_mesh()
        tc = TrainConfig(batch_size=8, max_gt_boxes=5, device_augment=True)
        state = create_train_state(model, tc, jax.random.PRNGKey(0))
        state = jax.device_put(
            state,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )
        step = make_sharded_train_step(model, tc, mesh)

        ds = TinyDataset(12)
        cache = DeviceDataCache(ds, target_size=128, max_gt=5, mesh=mesh)
        it = cache.batches(8, seed=0)
        state, m = step(state, next(it), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
        state, m = step(state, next(it), jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
