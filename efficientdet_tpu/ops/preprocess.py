"""Fused on-device image preprocessing.

TPU-native rebuild of the reference's host-side ``preprocess_image`` path
(SURVEY.md SS2 "Data generators": aspect-preserving resize -> pad-to-square ->
ImageNet normalise, mean [0.485, 0.456, 0.406], std [0.229, 0.224, 0.225]).
The whole chain is pure ``jnp`` so that, jitted together with the model, it
compiles into a single fused XLA program with no host round-trip between
preprocessing and the network (north star, BASELINE.json:5).

Shape discipline (SURVEY.md SS7 hard part #6): aspect-preserving resize is
data-dependent in general, but the *source* shape is static at trace time, so
the scale and the resized extent are Python constants per (H, W) — XLA sees
only static shapes. One compiled program exists per distinct source shape;
the batched throughput path uses fixed-size sources.

Images are RGB uint8 (or float in [0, 255]). The host is responsible only
for JPEG decode (reference used cv2 BGR; our loaders emit RGB).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _normalize(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    x = x.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def preprocess_image(
    image: jax.Array,
    target_size: int,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Resize long side to ``target_size``, pad to square, normalise.

    Args:
      image: (H, W, 3) RGB uint8/float.
      target_size: square model input size (static).

    Returns:
      (target_size, target_size, 3) normalised image, and the scalar scale
      factor applied (divide output boxes by it to return to source pixels).
    """
    h, w = image.shape[0], image.shape[1]
    scale = target_size / max(h, w)  # python float — static
    new_h, new_w = round(h * scale), round(w * scale)
    resized = jax.image.resize(
        image.astype(jnp.float32), (new_h, new_w, 3), method="bilinear"
    )
    out = _normalize(resized, dtype)
    out = jnp.pad(out, ((0, target_size - new_h), (0, target_size - new_w), (0, 0)))
    return out, jnp.float32(scale)


def preprocess_batch_fixed(images: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Normalise a batch already at model resolution: (B, S, S, 3) -> same.

    The hot path for batched/sharded inference (BASELINE.json configs 2/3/5):
    just the fused normalise, which XLA folds into the stem convolution's
    input transform.
    """
    return _normalize(images, dtype)
