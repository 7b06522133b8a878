"""Feature-map resampling for the BiFPN (SURVEY.md SS2 "BiFPN").

Up: nearest-neighbour 2x (the reference's UpSampling2D). Down: 3x3 stride-2
max-pool with SAME padding (the reference's MaxPooling2D(3, 2, 'same')).
Both are layout-friendly NHWC ops that XLA lowers to cheap TPU programs;
no Pallas needed here (SURVEY.md SS7 hard part #5: benchmark first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, 2H, 2W, C) nearest-neighbour."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def upsample_to(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest upsample to an explicit (out_h, out_w); handles odd sizes."""
    b, h, w, c = x.shape
    if out_h == 2 * h and out_w == 2 * w:
        return upsample_nearest_2x(x)
    return jax.image.resize(x, (b, out_h, out_w, c), method="nearest")


def downsample_maxpool(x: jax.Array, window: int = 3, stride: int = 2) -> jax.Array:
    """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), C) max-pool, SAME padding."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME",
    )
