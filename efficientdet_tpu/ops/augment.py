"""On-device data augmentation: the host augmentor moved into the XLA step.

The reference augments on the host (``utils/transform.py`` +
``augmentor/color.py`` over cv2, SURVEY.md §2 "Augmentation"), which is fine
behind a GPU fed by many CPU cores. On a TPU pod slice the host:chip core
ratio is the scarce resource — this module runs the SAME augmentation family
(random affine applied jointly to image and boxes, then
contrast/brightness/hue/saturation) as part of the jitted train step, so the
host's only remaining per-image work is JPEG decode + letterbox.

Semantics relative to the host path (``data/augment.py``):

* transforms act on the LETTERBOXED canvas (B, S, S, 3), conjugated about
  each image's VISIBLE extent centre (a flip maps the image onto itself,
  never into the letterbox padding) with translations scaled by the extent
  — the same geometry as the host path's transform-about-the-image-centre
  on the raw image, composed with the letterbox scale.
* the warp matches ``cv2.warpAffine(..., INTER_LINEAR, BORDER_CONSTANT)``:
  the matrix maps source→destination in pixel-centre coordinates, the
  sampler bilinearly interpolates at the inverse-mapped position and reads
  0 outside the source. (cv2 interpolates in 5-bit fixed point; expect
  ≤1-level uint8 differences.)
* boxes transform exactly as the host/reference do: map all four corners,
  re-axis-align, clip to the image's letterboxed extent, and drop
  degenerates — here by setting the label to -1, which anchor matching
  already treats as padding.
* colour ops are float equivalents of the uint8/HSV host ops, vectorised
  over the batch on the VPU.

Everything is shape-static and jit/pjit-composable; randomness flows from
the train step's rng, so a step remains a pure function of (state, batch,
rng).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from efficientdet_tpu.data.augment import TransformConfig


@dataclasses.dataclass(frozen=True)
class ColorConfig:
    """Ranges mirroring ``data.augment.random_visual_effect`` defaults."""

    contrast_range: Tuple[float, float] = (0.9, 1.1)
    brightness_range: Tuple[float, float] = (-0.1, 0.1)
    hue_range: Tuple[float, float] = (-0.05, 0.05)
    saturation_range: Tuple[float, float] = (0.95, 1.05)


# ---------------------------------------------------------------------------
# Random affine matrices (batched jax mirror of data/augment.py builders)
# ---------------------------------------------------------------------------


def sample_transform_matrices(
    rng: jax.Array,
    batch_size: int,
    size: int,
    config: TransformConfig = TransformConfig(),
    extents: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, 3, 3) random affines about the visible-image centre.

    Same composition order as the host ``random_transform_matrix``
    (reference multi_dot: rotation @ translation @ shear @ scaling @ flip,
    so the flip acts on points first), conjugated by the
    centring translation. ``extents`` (B, 2) = (scaled_h, scaled_w) gives
    the visible-image extent inside each letterboxed canvas; the transform
    is conjugated about ITS centre (and translations scale with it), so a
    flip maps the image onto itself instead of into the letterbox padding —
    exactly the host path's flip-about-the-image-centre semantics. None →
    the full canvas (square inputs).
    """
    c = config
    keys = jax.random.split(rng, 8)
    u = lambda k, lo, hi: jax.random.uniform(
        k, (batch_size,), jnp.float32, lo, hi
    )

    if extents is None:
        ext_w = jnp.full((batch_size,), float(size), jnp.float32)
        ext_h = ext_w
    else:
        ext_h = extents[:, 0].astype(jnp.float32)
        ext_w = extents[:, 1].astype(jnp.float32)

    ang = u(keys[0], c.min_rotation, c.max_rotation)
    tx = u(keys[1], c.min_translation[0], c.max_translation[0]) * ext_w
    ty = u(keys[2], c.min_translation[1], c.max_translation[1]) * ext_h
    shear = u(keys[3], c.min_shear, c.max_shear)
    sx = u(keys[4], c.min_scaling[0], c.max_scaling[0])
    sy = u(keys[5], c.min_scaling[1], c.max_scaling[1])
    fx = jnp.where(
        jax.random.uniform(keys[6], (batch_size,)) < c.flip_x_chance, -1.0, 1.0
    )
    fy = jnp.where(
        jax.random.uniform(keys[7], (batch_size,)) < c.flip_y_chance, -1.0, 1.0
    )

    z = jnp.zeros((batch_size,), jnp.float32)
    o = jnp.ones((batch_size,), jnp.float32)

    def mat(rows):
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )  # (B, 3, 3)

    cos, sin = jnp.cos(ang), jnp.sin(ang)
    rot = mat([[cos, -sin, z], [sin, cos, z], [z, z, o]])
    trans = mat([[o, z, tx], [z, o, ty], [z, z, o]])
    shr = mat([[o, -jnp.sin(shear), z], [z, jnp.cos(shear), z], [z, z, o]])
    scl = mat([[sx, z, z], [z, sy, z], [z, z, o]])
    flp = mat([[fx, z, z], [z, fy, z], [z, z, o]])

    # Reference composition (multi_dot([rot, trans, shear, scale, flip])):
    # flip applied to points FIRST, rotation LAST — must match the host
    # random_transform_matrix exactly (equivalence tested).
    m = rot @ trans @ shr @ scl @ flp
    hx, hy = 0.5 * ext_w, 0.5 * ext_h
    center = mat([[o, z, hx], [z, o, hy], [z, z, o]])
    uncenter = mat([[o, z, -hx], [z, o, -hy], [z, z, o]])
    return center @ m @ uncenter


# ---------------------------------------------------------------------------
# Batched affine warp (cv2.warpAffine equivalent)
# ---------------------------------------------------------------------------


def affine_warp_batch(images: jax.Array, matrices: jax.Array) -> jax.Array:
    """Warp (B, S, S, 3) by per-image src→dst affines; 0 border.

    Returns float32 in [0, 255]. Bilinear sampling at the inverse-mapped
    pixel-centre positions — ``map_coordinates(order=1, cval=0)`` is exactly
    cv2's INTER_LINEAR + BORDER_CONSTANT up to fixed-point rounding.
    """
    size = images.shape[1]
    inv = jnp.linalg.inv(matrices)  # (B, 3, 3) — dst→src
    xs = jnp.arange(size, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")  # (S, S) dst pixel centres

    def warp_one(image, m):
        # src = M^-1 @ (x, y, 1); matrices are in (x, y) convention like cv2
        src_x = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
        src_y = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
        coords = jnp.stack([src_y, src_x])  # map_coordinates wants (row, col)

        def chan(img2d):
            return jax.scipy.ndimage.map_coordinates(
                img2d, coords, order=1, mode="constant", cval=0.0
            )

        return jnp.stack(
            [chan(image[..., c]) for c in range(image.shape[-1])], axis=-1
        )

    return jax.vmap(warp_one)(images.astype(jnp.float32), inv)


def transform_boxes_batch(
    matrices: jax.Array, boxes: jax.Array
) -> jax.Array:
    """(B, 3, 3) × (B, G, 4) xyxy → transformed, re-axis-aligned boxes.

    Same corner math as the host ``transform_boxes`` / the reference.
    """
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    corners = jnp.stack(
        [
            jnp.stack([x1, y1], -1),
            jnp.stack([x2, y1], -1),
            jnp.stack([x1, y2], -1),
            jnp.stack([x2, y2], -1),
        ],
        axis=-2,
    )  # (B, G, 4, 2)
    pts = (
        jnp.einsum("bij,bgcj->bgci", matrices[:, :2, :2], corners)
        + matrices[:, None, None, :2, 2]
    )
    return jnp.concatenate([pts.min(axis=-2), pts.max(axis=-2)], axis=-1)


# ---------------------------------------------------------------------------
# Colour ops (float equivalents of augmentor/color.py on the VPU)
# ---------------------------------------------------------------------------


def _rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """RGB [0,1] → HSV with H in [0,1) (continuous, unlike cv2's 180 bins)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r,
        (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = jnp.where(d > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == k for k in range(6)], [v, q, p, p, t, v])
    g = jnp.select([i == k for k in range(6)], [t, v, v, q, p, p])
    b = jnp.select([i == k for k in range(6)], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def random_color_batch(
    rng: jax.Array,
    images: jax.Array,
    config: ColorConfig = ColorConfig(),
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """contrast → brightness → hue → saturation, per image, in float.

    Input/output: (B, S, S, 3) float32 in [0, 255]. ``mask`` (B, S, S, 1)
    in {0,1} marks the visible-image region of a letterboxed canvas:
    colour applies only there (the letterbox padding stays exactly 0,
    matching eval-time preprocessing) and the contrast mean is computed
    over visible pixels only (the host path colours BEFORE letterboxing,
    so its mean never sees padding either).
    """
    c = config
    b = images.shape[0]
    keys = jax.random.split(rng, 4)
    u = lambda k, lo, hi: jax.random.uniform(k, (b, 1, 1), jnp.float32, lo, hi)
    contrast = u(keys[0], *c.contrast_range)
    brightness = u(keys[1], *c.brightness_range)
    hue = u(keys[2], *c.hue_range)
    saturation = u(keys[3], *c.saturation_range)

    x0 = images.astype(jnp.float32)
    if mask is None:
        mean = x0.mean(axis=(1, 2), keepdims=True)
    else:
        n = jnp.maximum(mask.sum(axis=(1, 2), keepdims=True), 1.0)
        mean = (x0 * mask).sum(axis=(1, 2), keepdims=True) / n
    x = jnp.clip((x0 - mean) * contrast[..., None] + mean, 0, 255)
    x = jnp.clip(x + brightness[..., None] * 255.0, 0, 255)

    hsv = _rgb_to_hsv(x / 255.0)
    h = (hsv[..., 0] + hue) % 1.0
    s = jnp.clip(hsv[..., 1] * saturation, 0.0, 1.0)
    x = _hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1)) * 255.0
    x = jnp.clip(x, 0, 255)
    if mask is not None:
        x = x * mask + x0 * (1.0 - mask)
    return x


# ---------------------------------------------------------------------------
# Full batch augmentation (plugs into the jitted train step)
# ---------------------------------------------------------------------------


def augment_batch_device(
    rng: jax.Array,
    images: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    extents: Optional[jax.Array] = None,
    transform_config: TransformConfig = TransformConfig(),
    color_config: ColorConfig = ColorConfig(),
    geometric: bool = True,
    color: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Augment a letterboxed batch on device.

    Args:
      rng: per-step PRNG key (consumed; split internally).
      images: (B, S, S, 3) uint8/float letterboxed canvases.
      gt_boxes: (B, G, 4) float32 xyxy in canvas coords; rows beyond the
        valid count are arbitrary.
      gt_labels: (B, G) int32, -1 padding.
      extents: (B, 2) float32 (scaled_h, scaled_w) valid image extent per
        canvas — boxes are clipped here, matching the host path's clip
        against the scaled image rather than the padded canvas (ADVICE r1).
        None → clip to the full canvas.

    Returns (images float32 [0,255], gt_boxes, gt_labels) — degenerate
    post-transform boxes get label -1.
    """
    b, size = images.shape[0], images.shape[1]
    k_geo, k_col = jax.random.split(rng)
    x = images.astype(jnp.float32)

    if extents is None:
        hi = jnp.full((b, 2), float(size), jnp.float32)
    else:
        hi = extents.astype(jnp.float32)
    rows = jnp.arange(size, dtype=jnp.float32)
    ext_mask = (
        (rows[None, :, None] < hi[:, 0, None, None])
        & (rows[None, None, :] < hi[:, 1, None, None])
    )[..., None].astype(jnp.float32)  # (B, S, S, 1) visible-image rect

    if geometric:
        # conjugate the affine about the VISIBLE-IMAGE centre (not the
        # canvas centre): a flip then maps the image onto itself instead of
        # into the letterbox padding, matching the host path's
        # flip-about-the-image-centre semantics.
        mats = sample_transform_matrices(
            k_geo, b, size, transform_config, extents=extents
        )
        # warp an alpha channel alongside RGB: it marks where source
        # content landed, so colour ops can skip warped-in black borders
        # (the host colours BEFORE warping, so its borders stay black too)
        x4 = jnp.concatenate([x, ext_mask * 255.0], axis=-1)
        w4 = affine_warp_batch(x4, mats)
        x = w4[..., :3] * ext_mask  # content past the extent rect is
        # dropped, exactly as the box clip below drops it
        vis = (w4[..., 3:] > 127.5).astype(jnp.float32) * ext_mask
        gt_boxes = transform_boxes_batch(mats, gt_boxes)
    else:
        vis = ext_mask
    if color:
        x = random_color_batch(k_col, x, color_config, mask=vis)

    # clip to (w, h) order for xyxy and drop degenerates via label = -1
    lim = jnp.stack([hi[:, 1], hi[:, 0], hi[:, 1], hi[:, 0]], axis=-1)
    gt_boxes = jnp.clip(gt_boxes, 0.0, lim[:, None, :])
    w = gt_boxes[..., 2] - gt_boxes[..., 0]
    h = gt_boxes[..., 3] - gt_boxes[..., 1]
    valid = (w >= 1.0) & (h >= 1.0)
    gt_labels = jnp.where(valid, gt_labels, -1)
    return x, gt_boxes, gt_labels
