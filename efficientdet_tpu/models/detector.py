"""EfficientDet assembly and the D0..D7 builder API.

Rebuild of the reference's ``efficientdet()`` in ``model.py`` (SURVEY.md SS2
"BiFPN + detector assembly", SS3.5). The reference returns a
``(train_model, prediction_model)`` pair sharing weights; the TPU-native
equivalent is ONE Flax module with two jit-compiled entry points over the
same params:

* ``EfficientDet.__call__``  -> raw (class logits, box deltas) per anchor
  (the training model's outputs), and
* :func:`make_predict_fn` / :class:`Detector` -> the prediction pipeline
  appending sigmoid + decode + clip + per-class NMS fully on-device
  (reference RegressBoxes/ClipBoxes/FilterDetections).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdet_tpu.anchors import anchors_for_shape
from efficientdet_tpu.configs import EvalConfig, ModelConfig
from efficientdet_tpu.models.bifpn import BiFPN
from efficientdet_tpu.models.efficientnet import EfficientNet
from efficientdet_tpu.models.heads import BoxNet, ClassNet
from efficientdet_tpu.ops.preprocess import preprocess_batch_fixed

Dtype = Any


class EfficientDet(nn.Module):
    """Backbone -> BiFPN -> shared heads. Output: raw per-anchor tensors."""

    config: ModelConfig
    dtype: Dtype = jnp.float32
    # Inference-only: BatchNorms folded into conv weights
    # (utils/fold_bn.py). Training must use fuse_bn=False.
    fuse_bn: bool = False

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        return_raw_levels: bool = False,
        return_anchor_major_levels: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        """images (B, S, S, 3) normalised -> (cls_logits (B,A,C), box (B,A,4)).

        With ``return_raw_levels`` the heads return per-level NHWC conv
        outputs instead (lists of (B,H,W,A*C) / (B,H,W,A*4)) — the fast
        inference path consumes these without the anchor-major reshape.
        """
        cfg = self.config
        # freeze_bn: BN always uses running stats (reference freeze_bn flag).
        ura = (not train) or cfg.freeze_bn
        remat_backbone = cfg.remat and cfg.remat_scope in ("full", "backbone")
        remat_fpn = cfg.remat and cfg.remat_scope in ("full", "fpn")
        c3, c4, c5 = EfficientNet(
            model_name=cfg.backbone,
            survival_prob=cfg.survival_prob,
            bn_momentum=cfg.bn_momentum,
            bn_epsilon=cfg.bn_epsilon,
            dtype=self.dtype,
            fuse_bn=self.fuse_bn,
            remat=remat_backbone,
            remat_max_stage=cfg.remat_max_stage,
            name="backbone",
        )(images, train=train, use_running_average=ura)
        feats = BiFPN(
            features=cfg.bifpn_width,
            depth=cfg.bifpn_depth,
            weighted=cfg.weighted_bifpn,
            bn_momentum=cfg.bn_momentum,
            bn_epsilon=cfg.bn_epsilon,
            dtype=self.dtype,
            fuse_bn=self.fuse_bn,
            remat=remat_fpn,
            name="bifpn",
        )(
            [c3, c4, c5], use_running_average=ura
        )
        cls_logits = ClassNet(
            width=cfg.bifpn_width,
            depth=cfg.head_depth,
            num_classes=cfg.num_classes,
            num_anchors=cfg.num_anchors_per_cell,
            bn_momentum=cfg.bn_momentum,
            bn_epsilon=cfg.bn_epsilon,
            dtype=self.dtype,
            fuse_bn=self.fuse_bn,
            remat=remat_fpn,
            name="class_net",
        )(
            feats,
            use_running_average=ura,
            return_raw_levels=return_raw_levels,
            return_anchor_major_levels=return_anchor_major_levels,
        )
        box_deltas = BoxNet(
            width=cfg.bifpn_width,
            depth=cfg.head_depth,
            num_anchors=cfg.num_anchors_per_cell,
            bn_momentum=cfg.bn_momentum,
            bn_epsilon=cfg.bn_epsilon,
            dtype=self.dtype,
            fuse_bn=self.fuse_bn,
            remat=remat_fpn,
            name="box_net",
        )(
            feats,
            use_running_average=ura,
            return_raw_levels=return_raw_levels,
            return_anchor_major_levels=return_anchor_major_levels,
        )
        return cls_logits, box_deltas


def build_efficientdet(
    phi: int,
    num_classes: int = 90,
    weighted_bifpn: bool | None = None,
    freeze_bn: bool = False,
    dtype: Dtype = jnp.float32,
    image_size: int | None = None,
    remat: bool = False,
    remat_scope: str = "full",
    remat_max_stage: int = 7,
) -> Tuple[EfficientDet, ModelConfig]:
    """The reference's ``efficientdet(phi, ...)`` builder."""
    if remat_scope not in ("full", "backbone", "fpn"):
        raise ValueError(f"remat_scope must be full|backbone|fpn, got {remat_scope!r}")
    config = ModelConfig.for_phi(
        phi,
        num_classes=num_classes,
        weighted_bifpn=weighted_bifpn,
        freeze_bn=freeze_bn,
        image_size=image_size,
    )
    if remat:
        import dataclasses

        config = dataclasses.replace(
            config, remat=True, remat_scope=remat_scope,
            remat_max_stage=remat_max_stage,
        )
    return EfficientDet(config=config, dtype=dtype), config


# Named builders mirroring the reference's D0..D7 surface.
def _named_builder(phi):
    def build(num_classes: int = 90, **kw):
        return build_efficientdet(phi, num_classes=num_classes, **kw)

    build.__name__ = f"efficientdet_d{phi}"
    build.__doc__ = f"Build EfficientDet-D{phi} (see build_efficientdet)."
    return build


efficientdet_d0 = _named_builder(0)
efficientdet_d1 = _named_builder(1)
efficientdet_d2 = _named_builder(2)
efficientdet_d3 = _named_builder(3)
efficientdet_d4 = _named_builder(4)
efficientdet_d5 = _named_builder(5)
efficientdet_d6 = _named_builder(6)
efficientdet_d7 = _named_builder(7)


def predict_pipeline(
    model: EfficientDet,
    variables,
    images: jax.Array,
    eval_config: EvalConfig = EvalConfig(),
    preprocess: bool = True,
    front_end: str | None = None,
):
    """Full on-device prediction: [normalise ->] forward -> decode -> NMS.

    Args:
      images: (B, S, S, 3); raw RGB [0,255] if ``preprocess`` else already
        normalised.
      front_end: how head outputs feed the NMS selection; all three produce
        identical detections (tested):
        * ``"anchor_major"`` (default) — the heads' final pointwise runs as
          a dot emitting batch-major (B, HW*A, C) rows per level; no
          (B, A_total, C) concat, no batch-minor retile (the two biggest
          NMS front-end costs in the device trace at D0/b128).
        * ``"concat"`` — reference-shaped (B, A_total, C) tensors.
        * ``"pixel_gather"`` — exact pixel-prefilter over conv-layout
          outputs; measured slower on v5e (batch-minor gather retiles),
          kept as documentation.
    Returns (boxes (B,D,4), scores (B,D), classes (B,D), num_valid (B,)).
    """
    cfg = model.config
    size = images.shape[1]
    front_end = front_end or "anchor_major"
    if preprocess:
        images = preprocess_batch_fixed(images, dtype=model.dtype)
    anchors = jnp.asarray(anchors_for_shape((size, size), cfg.anchor))
    # Late-decode NMS: selection in logit space, decode only the candidates
    # (exact; see ops/nms.py).
    if front_end == "anchor_major":
        from efficientdet_tpu.ops.nms import (
            batched_filter_from_anchor_major_levels,
        )

        cls_levels, box_levels = model.apply(
            variables, images, train=False, return_anchor_major_levels=True
        )
        return batched_filter_from_anchor_major_levels(
            anchors, box_levels, cls_levels, (size, size), eval_config
        )
    if front_end == "pixel_gather":
        from efficientdet_tpu.ops.nms import batched_filter_from_level_logits

        cls_levels, box_levels = model.apply(
            variables, images, train=False, return_raw_levels=True
        )
        return batched_filter_from_level_logits(
            anchors, box_levels, cls_levels, (size, size), eval_config
        )
    if front_end != "concat":
        raise ValueError(f"unknown front_end {front_end!r}")
    from efficientdet_tpu.ops.nms import batched_filter_from_logits

    cls_logits, box_deltas = model.apply(variables, images, train=False)
    return batched_filter_from_logits(
        anchors, box_deltas, cls_logits, (size, size), eval_config
    )


def make_predict_fn(
    model: EfficientDet,
    eval_config: EvalConfig = EvalConfig(),
    preprocess: bool = True,
):
    """Return a jitted ``(variables, images) -> detections`` function."""

    @jax.jit
    def predict(variables, images):
        return predict_pipeline(
            model, variables, images, eval_config, preprocess=preprocess
        )

    return predict


def fuse_for_inference(model: EfficientDet, variables):
    """Fold backbone/BiFPN BatchNorms into conv weights for inference.

    Returns ``(fused_model, fused_variables)`` computing the same function
    with zero BatchNorm ops (head BNs fold into per-level pointwise copies).
    ~1.5-2x faster on the bandwidth-bound high-resolution stages; see
    utils/fold_bn.py.
    """
    from efficientdet_tpu.utils.fold_bn import fold_bn_variables

    fused_model = EfficientDet(
        config=model.config, dtype=model.dtype, fuse_bn=True
    )
    fused_vars = fold_bn_variables(variables, eps=model.config.bn_epsilon)
    return fused_model, fused_vars
