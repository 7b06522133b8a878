"""Host-side data augmentation (reference ``utils/transform.py`` +
``augmentor/{color,transform,misc}.py``, SURVEY.md SS2 "Augmentation").

Geometric transforms are 3x3 homogeneous matrices applied jointly to the
image (cv2.warpAffine) and the boxes (corner transform + re-axis-align),
exactly the reference's scheme. Visual effects operate on uint8 RGB.
All randomness flows through a caller-provided ``np.random.RandomState`` so
batches are reproducible.

The composed ``random_transform``/``VisualEffect`` entry points plug into
``data.common.batch_iterator(augment=...)`` with signature
``(rng, image, boxes) -> (image, boxes)``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Matrix builders
# ---------------------------------------------------------------------------


def rotation_matrix(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def translation_matrix(tx: float, ty: float) -> np.ndarray:
    return np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)


def shear_matrix(angle: float) -> np.ndarray:
    return np.array(
        [[1, -np.sin(angle), 0], [0, np.cos(angle), 0], [0, 0, 1]], np.float32
    )


def scaling_matrix(sx: float, sy: float) -> np.ndarray:
    return np.array([[sx, 0, 0], [0, sy, 0], [0, 0, 1]], np.float32)


def flip_matrix(flip_x: bool, flip_y: bool) -> np.ndarray:
    return scaling_matrix(-1.0 if flip_x else 1.0, -1.0 if flip_y else 1.0)


def center_transform(matrix: np.ndarray, image_hw: Tuple[int, int]) -> np.ndarray:
    """Apply ``matrix`` about the image centre (reference change_transform_origin)."""
    h, w = image_hw
    center = translation_matrix(0.5 * w, 0.5 * h)
    uncenter = translation_matrix(-0.5 * w, -0.5 * h)
    return center @ matrix @ uncenter


def transform_boxes(matrix: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Transform xyxy boxes: map all 4 corners, re-axis-align (reference)."""
    if len(boxes) == 0:
        return boxes
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    corners = np.stack(
        [
            np.stack([x1, y1], -1),
            np.stack([x2, y1], -1),
            np.stack([x1, y2], -1),
            np.stack([x2, y2], -1),
        ],
        axis=1,
    )  # (N, 4, 2)
    ones = np.ones((*corners.shape[:2], 1), np.float32)
    hom = np.concatenate([corners, ones], -1) @ matrix.T  # (N, 4, 3)
    pts = hom[..., :2]
    out = np.concatenate([pts.min(axis=1), pts.max(axis=1)], -1)
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Random geometric augmentation
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TransformConfig:
    """Ranges mirroring the reference's random_transform defaults."""

    min_rotation: float = -0.1
    max_rotation: float = 0.1
    min_translation: Tuple[float, float] = (-0.1, -0.1)
    max_translation: Tuple[float, float] = (0.1, 0.1)
    min_shear: float = -0.1
    max_shear: float = 0.1
    min_scaling: Tuple[float, float] = (0.9, 0.9)
    max_scaling: Tuple[float, float] = (1.1, 1.1)
    flip_x_chance: float = 0.5
    flip_y_chance: float = 0.0


def random_transform_matrix(
    rng: np.random.RandomState,
    image_hw: Tuple[int, int],
    config: TransformConfig = TransformConfig(),
) -> np.ndarray:
    c = config
    h, w = image_hw
    # Draw order AND composition order both mirror the reference
    # (keras-retinanet utils/transform.py random_transform):
    # multi_dot([rotation, translation, shear, scaling, flip]) — i.e. the
    # flip is applied to points FIRST and the rotation LAST, so the
    # pixel-unit translation is never scaled or flipped. An earlier
    # revision composed in application order (flip outermost), which
    # silently shifted the augmentation distribution vs the reference
    # (round-3 review finding).
    r = rotation_matrix(rng.uniform(c.min_rotation, c.max_rotation))
    tx = rng.uniform(c.min_translation[0], c.max_translation[0]) * w
    ty = rng.uniform(c.min_translation[1], c.max_translation[1]) * h
    t = translation_matrix(tx, ty)
    sh = shear_matrix(rng.uniform(c.min_shear, c.max_shear))
    sc = scaling_matrix(
        rng.uniform(c.min_scaling[0], c.max_scaling[0]),
        rng.uniform(c.min_scaling[1], c.max_scaling[1]),
    )
    f = flip_matrix(
        rng.uniform() < c.flip_x_chance, rng.uniform() < c.flip_y_chance
    )
    m = r @ t @ sh @ sc @ f
    return center_transform(m, image_hw)


def apply_transform(
    matrix: np.ndarray, image: np.ndarray, boxes: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    import cv2

    h, w = image.shape[:2]
    warped = cv2.warpAffine(
        image,
        matrix[:2],
        (w, h),
        flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=0,
    )
    return warped, transform_boxes(matrix, boxes)


# ---------------------------------------------------------------------------
# Visual effects (reference augmentor/color.py)
# ---------------------------------------------------------------------------


def adjust_brightness(image: np.ndarray, delta: float) -> np.ndarray:
    return np.clip(image.astype(np.float32) + delta * 255.0, 0, 255).astype(np.uint8)


def adjust_contrast(image: np.ndarray, factor: float) -> np.ndarray:
    mean = image.mean(axis=(0, 1), keepdims=True)
    return np.clip(
        (image.astype(np.float32) - mean) * factor + mean, 0, 255
    ).astype(np.uint8)


def adjust_saturation(image: np.ndarray, factor: float) -> np.ndarray:
    import cv2

    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * factor, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def adjust_hue(image: np.ndarray, delta: float) -> np.ndarray:
    import cv2

    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.int32)
    hsv[..., 0] = (hsv[..., 0] + int(delta * 180)) % 180
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def random_visual_effect(
    rng: np.random.RandomState,
    image: np.ndarray,
    contrast_range=(0.9, 1.1),
    brightness_range=(-0.1, 0.1),
    hue_range=(-0.05, 0.05),
    saturation_range=(0.95, 1.05),
) -> np.ndarray:
    """contrast -> brightness -> hue -> saturation, as the reference chains.

    Fused fast path (the host is often a single core and this was ~30 ms of
    float passes per image): contrast+brightness collapse into one
    per-channel 256-entry LUT — exact, including both intermediate clips,
    since a LUT tabulates the full composition per input value — and
    hue+saturation share one HSV round trip (the sequential form's extra
    HSV->RGB->HSV bounce only adds quantisation noise).
    """
    import cv2

    contrast = rng.uniform(*contrast_range)
    brightness = rng.uniform(*brightness_range)
    hue = rng.uniform(*hue_range)
    saturation = rng.uniform(*saturation_range)

    # one LUT per channel: clip(clip((v - m) * f + m) + delta * 255)
    # cv2.mean is SIMD over uint8 (0.06 ms vs numpy's 4.8 ms float64 pass
    # on a 0.2 MP image — the host is often one core; measured here).
    mean = np.asarray(cv2.mean(image)[:3])  # (3,) float64, same as np.mean
    v = np.arange(256, dtype=np.float32)[:, None]  # (256, 1)
    lut = np.clip((v - mean) * contrast + mean, 0, 255)
    lut = np.clip(lut + brightness * 255.0, 0, 255).astype(np.uint8)  # (256, 3)
    image = cv2.LUT(image, lut.reshape(1, 256, 3))

    # hue/saturation as one 3-channel LUT over the HSV image (H: add mod
    # 180, S: scale+clip, V: identity) — no float passes at all
    vi = np.arange(256, dtype=np.int32)
    lut_hsv = np.stack(
        [
            ((vi + int(hue * 180)) % 180).astype(np.uint8),
            np.clip(vi.astype(np.float32) * saturation, 0, 255).astype(
                np.uint8
            ),
            vi.astype(np.uint8),
        ],
        axis=1,
    )  # (256, 3)
    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV)
    hsv = cv2.LUT(hsv, lut_hsv.reshape(1, 256, 3))
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


# ---------------------------------------------------------------------------
# Misc crop / expand (reference augmentor/misc.py)
# ---------------------------------------------------------------------------


def random_crop(
    rng: np.random.RandomState,
    image: np.ndarray,
    boxes: np.ndarray,
    min_fraction: float = 0.6,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random crop keeping at least ``min_fraction`` of each side.

    Boxes are shifted into crop coordinates; ``batch_iterator`` re-filters
    degenerate boxes afterwards, matching the reference's crop semantics.
    """
    h, w = image.shape[:2]
    ch = int(h * rng.uniform(min_fraction, 1.0))
    cw = int(w * rng.uniform(min_fraction, 1.0))
    y0 = rng.randint(0, h - ch + 1)
    x0 = rng.randint(0, w - cw + 1)
    out = image[y0 : y0 + ch, x0 : x0 + cw]
    if len(boxes):
        boxes = boxes.copy()
        boxes[:, [0, 2]] -= x0
        boxes[:, [1, 3]] -= y0
    return out, boxes


def random_expand(
    rng: np.random.RandomState,
    image: np.ndarray,
    boxes: np.ndarray,
    max_ratio: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the image into a larger canvas at a random offset (zoom-out)."""
    h, w = image.shape[:2]
    ratio = rng.uniform(1.0, max_ratio)
    nh, nw = int(h * ratio), int(w * ratio)
    y0 = rng.randint(0, nh - h + 1)
    x0 = rng.randint(0, nw - w + 1)
    canvas = np.zeros((nh, nw, 3), image.dtype)
    canvas[y0 : y0 + h, x0 : x0 + w] = image
    if len(boxes):
        boxes = boxes.copy()
        boxes[:, [0, 2]] += x0
        boxes[:, [1, 3]] += y0
    return canvas, boxes


# ---------------------------------------------------------------------------
# Composite augmenter for batch_iterator
# ---------------------------------------------------------------------------


def make_augmenter(
    transform_config: Optional[TransformConfig] = TransformConfig(),
    visual: bool = True,
    crop_chance: float = 0.0,
    expand_chance: float = 0.0,
) -> Callable:
    """(rng, image, boxes) -> (image, boxes): the reference's
    ``--random-transform`` path (affine + color), plus optional crop/expand
    (reference augmentor/misc.py, off by default like the reference CLI)."""

    def augment(
        rng: np.random.RandomState,
        image: np.ndarray,
        boxes: np.ndarray,
        target_size: Optional[int] = None,
    ):
        if visual:
            image = random_visual_effect(rng, image)
        if crop_chance > 0 and rng.uniform() < crop_chance:
            image, boxes = random_crop(rng, image, boxes)
        elif expand_chance > 0 and rng.uniform() < expand_chance:
            image, boxes = random_expand(rng, image, boxes)
        if target_size is not None:
            # Fused warp + letterbox: compose the letterbox scaling into the
            # affine and resample ONCE, straight into the (S, S) canvas.
            # Halves the resample cost AND skips the separate letterbox
            # resize; box corners go through the composed matrix, which is
            # bit-identical to transform-then-scale (positive diagonal
            # scaling commutes with the corner min/max). One resample also
            # loses less detail than warp-then-resize.
            import cv2

            h, w = image.shape[:2]
            scale = target_size / max(h, w)
            m = (
                random_transform_matrix(rng, (h, w), transform_config)
                if transform_config is not None
                else np.eye(3)
            )
            # Image sampling uses the half-pixel-center form s*(x+0.5)-0.5
            # so the fused warp matches cv2.resize (the val/predict
            # letterbox); a corner-aligned scale would shift the resampled
            # image ~0.5px relative to eval preprocessing. Box corners keep
            # the plain scale, same convention as letterbox_hostside.
            t = 0.5 * (scale - 1.0)
            m_img = (
                np.array(
                    [[scale, 0.0, t], [0.0, scale, t], [0.0, 0.0, 1.0]],
                    np.float64,
                )
                @ m
            )
            canvas = cv2.warpAffine(
                image,
                m_img[:2],
                (target_size, target_size),
                flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT,
                borderValue=0,
            )
            m_box = scaling_matrix(scale, scale) @ m
            return canvas, transform_boxes(m_box, boxes), scale
        if transform_config is not None:
            m = random_transform_matrix(rng, image.shape[:2], transform_config)
            image, boxes = apply_transform(m, image, boxes)
        return image, boxes

    augment.supports_fused_letterbox = True
    return augment
