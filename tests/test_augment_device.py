"""On-device augmentation (ops/augment.py) vs the host path (data/augment.py).

The device path must implement the same transform family the reference's
``utils/transform.py`` + ``augmentor/color.py`` define — pinned here by
comparing against the host implementations on identical parameters (ranges
collapsed to points so both RNG styles draw the same values).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientdet_tpu.data.augment import (
    TransformConfig,
    adjust_brightness,
    adjust_contrast,
    random_transform_matrix,
    transform_boxes,
)
from efficientdet_tpu.ops.augment import (
    ColorConfig,
    _hsv_to_rgb,
    _rgb_to_hsv,
    affine_warp_batch,
    augment_batch_device,
    random_color_batch,
    sample_transform_matrices,
    transform_boxes_batch,
)


def _point_config(rot=0.05, tx=0.02, ty=-0.03, shear=0.04, sx=1.05, sy=0.95,
                  flip_x=0.0):
    """Ranges collapsed to points: host and device draw identical params."""
    return TransformConfig(
        min_rotation=rot, max_rotation=rot,
        min_translation=(tx, ty), max_translation=(tx, ty),
        min_shear=shear, max_shear=shear,
        min_scaling=(sx, sy), max_scaling=(sx, sy),
        flip_x_chance=flip_x, flip_y_chance=0.0,
    )


class TestMatrices:
    def test_matches_host_composition(self):
        size = 64
        cfg = _point_config()
        host = random_transform_matrix(
            np.random.RandomState(0), (size, size), cfg
        )
        dev = sample_transform_matrices(jax.random.PRNGKey(0), 3, size, cfg)
        assert dev.shape == (3, 3, 3)
        np.testing.assert_allclose(np.asarray(dev[0]), host, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dev[2]), host, atol=1e-5)

    def test_flip_certain(self):
        size = 64
        cfg = _point_config(rot=0, tx=0, ty=0, shear=0, sx=1, sy=1, flip_x=1.0)
        dev = np.asarray(
            sample_transform_matrices(jax.random.PRNGKey(1), 1, size, cfg)[0]
        )
        # flip about the centre: x -> size - x
        pt = dev @ np.array([10.0, 20.0, 1.0])
        np.testing.assert_allclose(pt[:2], [size - 10.0, 20.0], atol=1e-4)


class TestWarp:
    def test_matches_cv2_warp_affine(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.RandomState(0)
        size = 64
        image = rng.randint(0, 256, (size, size, 3), np.uint8)
        cfg = _point_config()
        m = random_transform_matrix(rng, (size, size), cfg)
        want = cv2.warpAffine(
            image, m[:2], (size, size),
            flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
            borderValue=0,
        ).astype(np.float32)
        got = np.asarray(
            affine_warp_batch(jnp.asarray(image)[None], jnp.asarray(m)[None])
        )[0]
        # cv2 interpolates in 5-bit fixed point; allow 2 uint8 levels and
        # ignore the 1-px seam where border handling quantises differently.
        diff = np.abs(got - want)
        assert np.median(diff) <= 1.0
        assert (diff <= 2.0).mean() > 0.98

    def test_identity_matrix_is_noop(self):
        rng = np.random.RandomState(1)
        image = rng.randint(0, 256, (2, 32, 32, 3), np.uint8)
        eye = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
        out = np.asarray(affine_warp_batch(jnp.asarray(image), eye))
        np.testing.assert_allclose(out, image.astype(np.float32), atol=1e-3)


class TestBoxes:
    def test_matches_host_transform_boxes(self):
        rng = np.random.RandomState(2)
        m = random_transform_matrix(rng, (64, 64), _point_config())
        boxes = rng.uniform(0, 60, (5, 4)).astype(np.float32)
        boxes = np.concatenate(
            [np.minimum(boxes[:, :2], boxes[:, 2:]),
             np.maximum(boxes[:, :2], boxes[:, 2:]) + 1], -1
        )
        want = transform_boxes(m, boxes)
        got = np.asarray(
            transform_boxes_batch(jnp.asarray(m)[None], jnp.asarray(boxes)[None])
        )[0]
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestColor:
    def test_identity_params_are_noop(self):
        rng = np.random.RandomState(3)
        x = rng.randint(0, 256, (2, 16, 16, 3)).astype(np.float32)
        cfg = ColorConfig(
            contrast_range=(1.0, 1.0), brightness_range=(0.0, 0.0),
            hue_range=(0.0, 0.0), saturation_range=(1.0, 1.0),
        )
        out = np.asarray(random_color_batch(jax.random.PRNGKey(0), x, cfg))
        np.testing.assert_allclose(out, x, atol=1e-2)

    def test_hsv_round_trip(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        back = _hsv_to_rgb(_rgb_to_hsv(x))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)

    def test_contrast_brightness_match_host(self):
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (16, 16, 3), np.uint8)
        contrast, brightness = 1.07, -0.06
        want = adjust_brightness(adjust_contrast(img, contrast), brightness)
        cfg = ColorConfig(
            contrast_range=(contrast, contrast),
            brightness_range=(brightness, brightness),
            hue_range=(0.0, 0.0), saturation_range=(1.0, 1.0),
        )
        got = np.asarray(
            random_color_batch(
                jax.random.PRNGKey(0), jnp.asarray(img)[None].astype(jnp.float32), cfg
            )
        )[0]
        # host clips+casts to uint8 between the two ops; device stays float
        assert np.abs(got - want.astype(np.float32)).max() <= 2.0


class TestAugmentBatch:
    def _batch(self, b=2, size=64, g=4):
        rng = np.random.RandomState(6)
        images = rng.randint(0, 256, (b, size, size, 3), np.uint8)
        boxes = np.zeros((b, g, 4), np.float32)
        labels = np.full((b, g), -1, np.int32)
        boxes[:, :2] = [[4, 4, 20, 20], [30, 30, 50, 50]]
        labels[:, :2] = [1, 2]
        return jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels)

    def test_jittable_and_deterministic(self):
        images, boxes, labels = self._batch()
        fn = jax.jit(
            lambda k: augment_batch_device(k, images, boxes, labels)
        )
        a = fn(jax.random.PRNGKey(7))
        b = fn(jax.random.PRNGKey(7))
        c = fn(jax.random.PRNGKey(8))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))

    def test_degenerate_boxes_dropped_via_label(self):
        images, boxes, labels = self._batch()
        # a box entirely inside the letterbox padding (beyond the extent)
        boxes = boxes.at[0, 1].set(jnp.asarray([60.0, 60.0, 63.0, 63.0]))
        extents = jnp.asarray([[40.0, 40.0], [64.0, 64.0]])
        cfg = _point_config(rot=0, tx=0, ty=0, shear=0, sx=1, sy=1)
        _, out_boxes, out_labels = augment_batch_device(
            jax.random.PRNGKey(0), images, boxes, labels,
            extents=extents, transform_config=cfg, color=False,
        )
        ob = np.asarray(out_boxes)
        assert np.asarray(out_labels)[0, 1] == -1          # clipped to nothing
        assert np.asarray(out_labels)[0, 0] == 1           # survives
        assert ob[0].max() <= 40.0 and ob[1].max() <= 64.0  # per-image extent

    def test_padding_labels_stay_invalid(self):
        images, boxes, labels = self._batch()
        _, _, out_labels = augment_batch_device(
            jax.random.PRNGKey(1), images, boxes, labels
        )
        assert (np.asarray(out_labels)[:, 2:] == -1).all()

    def test_flip_on_letterboxed_portrait_keeps_boxes(self):
        """Regression: a flip must map the image onto ITSELF (about the
        visible-extent centre), not reflect it into the letterbox padding
        where the extent clip would destroy every ground-truth box."""
        size = 64
        rng = np.random.RandomState(3)
        images = np.zeros((1, size, size, 3), np.uint8)
        # portrait content: only the left 32 columns are image
        images[:, :, :32] = rng.randint(1, 256, (1, size, 32, 3))
        boxes = jnp.asarray([[[2.0, 4.0, 20.0, 30.0]]])
        labels = jnp.asarray([[5]], jnp.int32)
        extents = jnp.asarray([[64.0, 32.0]])  # (h, w)
        cfg = _point_config(rot=0, tx=0, ty=0, shear=0, sx=1, sy=1,
                            flip_x=1.0)
        out_img, out_boxes, out_labels = augment_batch_device(
            jax.random.PRNGKey(0), jnp.asarray(images), boxes, labels,
            extents=extents, transform_config=cfg, color=False,
        )
        assert int(np.asarray(out_labels)[0, 0]) == 5  # box survives
        ob = np.asarray(out_boxes)[0, 0]
        # flipped about x = 16: [2, 20] -> [12, 30], y unchanged
        np.testing.assert_allclose(ob, [12.0, 4.0, 30.0, 30.0], atol=1e-3)
        oi = np.asarray(out_img)[0]
        assert oi[:, 32:].max() == 0.0      # padding still empty
        assert oi[:, :32].max() > 0.0       # content still present

    def test_box_geometry_matches_host_path_through_letterbox(self):
        """The device transform (about the extent centre, translations
        scaled by the extent) is exactly the letterbox-scale conjugation
        of the host transform (about the raw-image centre): boxes must
        come out identical whether transformed on the raw image then
        letterbox-scaled (host order) or letterbox-scaled then
        device-transformed."""
        raw_hw = (100, 50)  # portrait
        size = 64
        scale = size / max(raw_hw)
        cfg = _point_config()  # rot/trans/shear/scale point values
        host_m = random_transform_matrix(
            np.random.RandomState(0), raw_hw, cfg
        )
        raw_boxes = np.asarray(
            [[4.0, 8.0, 30.0, 60.0], [10.0, 20.0, 45.0, 90.0]], np.float32
        )
        host_out = transform_boxes(host_m, raw_boxes) * scale

        extents = jnp.asarray(
            [[raw_hw[0] * scale, raw_hw[1] * scale]], jnp.float32
        )
        dev_m = sample_transform_matrices(
            jax.random.PRNGKey(0), 1, size, cfg, extents=extents
        )
        dev_out = transform_boxes_batch(
            dev_m, jnp.asarray(raw_boxes * scale)[None]
        )
        np.testing.assert_allclose(
            np.asarray(dev_out)[0], host_out, atol=1e-3
        )

    def test_color_keeps_letterbox_padding_black(self):
        """Regression: brightness/contrast must not lift the letterbox
        padding away from 0 (eval-time preprocessing keeps it black)."""
        size = 64
        rng = np.random.RandomState(4)
        images = np.zeros((1, size, size, 3), np.uint8)
        images[:, :40, :40] = rng.randint(1, 256, (1, 40, 40, 3))
        boxes = jnp.asarray([[[2.0, 2.0, 20.0, 20.0]]])
        labels = jnp.asarray([[1]], jnp.int32)
        extents = jnp.asarray([[40.0, 40.0]])
        out_img, _, _ = augment_batch_device(
            jax.random.PRNGKey(9), jnp.asarray(images), boxes, labels,
            extents=extents, geometric=False, color=True,
        )
        oi = np.asarray(out_img)[0]
        assert oi[40:, :].max() == 0.0 and oi[:, 40:].max() == 0.0
        assert not np.array_equal(oi[:40, :40], images[0, :40, :40])


@pytest.mark.slow
class TestTrainStepIntegration:
    def test_device_augment_train_step(self):
        from efficientdet_tpu.configs import ModelConfig, TrainConfig
        from efficientdet_tpu.models.detector import EfficientDet
        from efficientdet_tpu.train_lib import (
            create_train_state,
            make_train_step,
        )

        model = EfficientDet(
            config=ModelConfig.for_phi(0, num_classes=4, image_size=128)
        )
        tc = TrainConfig(batch_size=2, max_gt_boxes=4, device_augment=True)
        state = create_train_state(model, tc, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, tc))

        rng = np.random.RandomState(0)
        batch = {
            "images": jnp.asarray(
                rng.randint(0, 256, (2, 128, 128, 3), np.uint8)
            ),
            "gt_boxes": jnp.asarray(
                np.tile(
                    np.array([[10, 10, 60, 60], [70, 70, 120, 120],
                              [0, 0, 0, 0], [0, 0, 0, 0]], np.float32),
                    (2, 1, 1),
                )
            ),
            "gt_labels": jnp.asarray(
                np.tile(np.array([1, 2, -1, -1], np.int32), (2, 1))
            ),
            "extents": jnp.asarray([[128.0, 128.0], [128.0, 96.0]]),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # a second step draws different augmentations (rng folded by step)
        state2, metrics2 = step(state, batch, jax.random.PRNGKey(1))
        assert float(metrics2["loss"]) != float(metrics["loss"])
