"""Shared class/box prediction heads (reference ``ClassNet``/``BoxNet``).

Per SURVEY.md SS2 "Class/Box heads": depth-``d`` stacks of SeparableConv 3x3
(width = BiFPN width) whose *conv weights are shared across P3..P7* but with
*per-level BatchNorm*, swish activations, and a final SeparableConv producing
``num_anchors * num_classes`` logits (bias initialised to the prior
probability pi=0.01, reference ``initializers.py``) or ``num_anchors * 4``
box deltas.

Weight sharing is expressed by constructing each conv module once and calling
it on every level — Flax reuses the parameters; the per-level BNs are
distinct submodules indexed (level, layer). This is the classic
silent-accuracy-killer flagged as SURVEY.md SS7 hard part #4, so the BN
wiring is unit-tested (tests/test_models.py).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdet_tpu.models.bifpn import SeparableConv
from efficientdet_tpu.models.normalization import TpuBatchNorm

Dtype = Any


def prior_prob_bias(prior: float = 0.01):
    """Reference PriorProbability initializer: bias = -log((1-pi)/pi)."""
    value = -math.log((1.0 - prior) / prior)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


class _PointwiseDot(nn.Module):
    """The final 1x1 conv as the fused Pallas matmul (ops/head_pallas.py).

    Parameter-compatible with the ``nn.Conv(name="pointwise")`` it replaces
    (kernel ``(1, 1, Cin, features)``, bias ``(features,)`` — same names,
    shapes, initializers), so checkpoints and fold_bn see no difference.

    Why it exists: at batch 128 XLA lays conv outputs out batch-minor
    (batch fills the 128 vector lanes), so the NMS front-end's per-image
    top-k/gathers forced a batch-major retile of the big (B, H, W, A*C)
    head outputs (~6-9 ms/step, device trace); expressing the pointwise as
    a plain dot did not help (XLA canonicalises it back to a convolution
    and re-picks layouts — measured). A Pallas call has fixed standard
    layouts at its boundary, so XLA retiles the SMALL depthwise input
    instead, and the kernel fuses the per-anchor class max the NMS anchor
    prefilter needs (the logits tensor is written once, never re-read).

    ``split_anchors=True``  (class head) -> ``(z (A, Mp, C), amax (B, A*HW))``
    ``split_anchors=False`` (box head)   -> ``(Mp, A*4)`` pixel rows
    (an (..., 4)-minor layout would pad 4 lanes to 128 = 32x write
    amplification; 36-wide pixel rows pad only 3.5x on a small tensor).
    """

    features: int
    num_anchors: int
    split_anchors: bool
    dtype: Dtype = jnp.float32
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, rows: jax.Array):
        """rows (M, Cin) -> (z (A, Mp, out), amax (A, Mp), M) when
        ``split_anchors`` else (Mp, features). Mp pads M to the kernel row
        tile; padded rows are bias-only garbage and must not be selected."""
        from efficientdet_tpu.ops.head_pallas import (
            head_pointwise_anchor_major,
            head_pointwise_reference,
        )

        cin = rows.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", self.bias_init, (self.features,), jnp.float32
        )
        k2d = kernel.reshape(cin, self.features)
        fn = (
            head_pointwise_anchor_major
            if jax.default_backend() == "tpu"
            else head_pointwise_reference
        )
        if self.split_anchors:
            return fn(rows.astype(self.dtype), k2d, bias, self.num_anchors)
        z, _, _ = fn(rows.astype(self.dtype), k2d, bias, 1)
        return z[0]  # (Mp, A*4) pixel rows


class _FinalConv(nn.Module):
    """The heads' output layer: depthwise 3x3 + pointwise 1x1.

    Parameter-compatible twin of ``SeparableConv`` (children ``depthwise``
    and ``pointwise`` with identical param trees). ``mode`` selects the
    pointwise implementation at call time over the SAME parameters:

    * ``"conv"``          — nn.Conv, (B, H, W, A*out) conv layout (training
                            and the concat inference path);
    * ``"anchor_major"``  — dot, (B, H*W*A, out) rows (class head);
    * ``"pixel_major"``   — dot, (B, H*W, A*out) rows (box head).
    """

    features: int
    num_anchors: int
    dtype: Dtype = jnp.float32
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array, mode: str = "conv") -> jax.Array:
        if mode in ("pw_anchor_major", "pw_pixel_major"):
            # x is (M, Cin) rows — the concatenation of every level's
            # depthwise output — so ONE kernel launch serves all levels
            # and the NMS front-end gathers from ONE buffer.
            return _PointwiseDot(
                features=self.features,
                num_anchors=self.num_anchors,
                split_anchors=(mode == "pw_anchor_major"),
                dtype=self.dtype,
                bias_init=self.bias_init,
                name="pointwise",
            )(x)
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (3, 3),
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        if mode == "dw":
            return x
        assert mode == "conv", mode
        return nn.Conv(
            self.features, (1, 1), use_bias=True, dtype=self.dtype,
            bias_init=self.bias_init, name="pointwise",
        )(x)


class _Head(nn.Module):
    """Common structure for ClassNet/BoxNet."""

    width: int
    depth: int
    num_outputs: int  # per-anchor outputs of the final conv
    num_anchors: int
    final_bias_init: Any  # flax bias initializer for the final pointwise
    # anchor-major final layout splits the A*out channels into (A, out) rows
    # (class head); the box head keeps pixel-major (A*4)-wide rows.
    anchor_major_split: bool = True
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    # Inference-folded variant: the per-level BN folds into a per-level COPY
    # of the (train-time shared) pointwise kernel; the depthwise stays
    # shared. utils/fold_bn.py builds the params.
    fuse_bn: bool = False

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        use_running_average: bool = True,
        return_raw_levels: bool = False,
        return_anchor_major_levels: bool = False,
    ) -> jax.Array:
        # Convs constructed once => weights shared across pyramid levels.
        if self.fuse_bn:
            dws = [
                nn.Conv(
                    self.width, (3, 3), padding="SAME",
                    feature_group_count=self.width, use_bias=False,
                    dtype=self.dtype, name=f"conv{i}_dw",
                )
                for i in range(self.depth)
            ]
        else:
            convs = [
                SeparableConv(self.width, dtype=self.dtype, name=f"conv{i}")
                for i in range(self.depth)
            ]
        final = _FinalConv(
            features=self.num_outputs * self.num_anchors,
            num_anchors=self.num_anchors,
            dtype=self.dtype,
            bias_init=self.final_bias_init or nn.initializers.zeros,
            name="final",
        )
        outputs = []
        rows = []
        hws = []
        bsz = feats[0].shape[0]
        for lvl, x in enumerate(feats):
            for i in range(self.depth):
                if self.fuse_bn:
                    x = dws[i](x)
                    x = nn.Conv(
                        self.width, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"pw_l{lvl}_d{i}",
                    )(x)
                else:
                    x = convs[i](x)
                    x = TpuBatchNorm(
                        use_running_average=use_running_average,
                        momentum=self.bn_momentum,
                        epsilon=self.bn_epsilon,
                        name=f"bn_l{lvl}_d{i}",
                    )(x)
                x = nn.swish(x)
            if return_anchor_major_levels:
                # final depthwise per level (shared weights); the pointwise
                # runs ONCE below over every level's rows concatenated.
                d = final(x, mode="dw")
                b, h, w, cin = d.shape
                rows.append(d.reshape(b * h * w, cin))
                hws.append(h * w)
                continue
            x = final(x, mode="conv")
            if return_raw_levels:
                outputs.append(x)  # (B, H, W, A*out) conv layout
                continue
            b, h, w, _ = x.shape
            outputs.append(x.reshape(b, h * w * self.num_anchors, self.num_outputs))
        if return_anchor_major_levels:
            allrows = jnp.concatenate(rows, axis=0)  # (M_tot, Cin)
            if not self.anchor_major_split:
                zb = final(allrows, mode="pw_pixel_major")  # (Mp_tot, A*4)
                return zb, tuple(hws)
            a = self.num_anchors
            z, amax, m = final(allrows, mode="pw_anchor_major")
            # assemble the per-image best-class vector (B, A_total):
            # slice each level's span of amax (A, Mp_tot), lift the anchor
            # plane above the pixel index (major-dim moves, cheap — these
            # are small tensors)
            parts = []
            off = 0
            for hw in hws:
                seg = (
                    amax[:, off : off + bsz * hw]
                    .reshape(a, bsz, hw)
                    .transpose(1, 0, 2)
                    .reshape(bsz, a * hw)
                )
                parts.append(seg)
                off += bsz * hw
            amax_img = jnp.concatenate(parts, axis=1)  # (B, A_total)
            return z, amax_img, tuple(hws)
        if return_raw_levels:
            # NHWC conv layout, no anchor-major reshape: the per-level NMS
            # prefilter consumes this directly.
            return outputs
        return jnp.concatenate(outputs, axis=1)  # (B, A_total, num_outputs)


def _head_cls(remat, return_raw_levels, return_anchor_major_levels):
    """_Head, optionally remat-wrapped (ModelConfig.remat).

    The concat-output and raw-level paths are checkpointable (their outputs
    are arrays / lists of arrays); the anchor-major variant is not (it
    returns static aux like per-level pixel counts, which jax.checkpoint
    outputs cannot carry) — and it is inference-only anyway, where
    activation memory does not matter.
    """
    if remat and not return_anchor_major_levels:
        # (self, feats, ura, raw, anchor_major) -> statics 2, 3, 4.
        return nn.remat(_Head, static_argnums=(2, 3, 4))
    return _Head


class ClassNet(nn.Module):
    """Classification head -> (B, A, num_classes) logits."""

    width: int
    depth: int
    num_classes: int
    num_anchors: int = 9
    prior: float = 0.01
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    fuse_bn: bool = False
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        use_running_average: bool = True,
        return_raw_levels: bool = False,
        return_anchor_major_levels: bool = False,
    ) -> jax.Array:
        return _head_cls(
            self.remat, return_raw_levels, return_anchor_major_levels
        )(
            width=self.width,
            depth=self.depth,
            num_outputs=self.num_classes,
            num_anchors=self.num_anchors,
            final_bias_init=prior_prob_bias(self.prior),
            anchor_major_split=True,
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            dtype=self.dtype,
            fuse_bn=self.fuse_bn,
            name="net",
        )(feats, use_running_average, return_raw_levels,
          return_anchor_major_levels)


class BoxNet(nn.Module):
    """Box regression head -> (B, A, 4) encoded deltas."""

    width: int
    depth: int
    num_anchors: int = 9
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    fuse_bn: bool = False
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        use_running_average: bool = True,
        return_raw_levels: bool = False,
        return_anchor_major_levels: bool = False,
    ) -> jax.Array:
        return _head_cls(
            self.remat, return_raw_levels, return_anchor_major_levels
        )(
            width=self.width,
            depth=self.depth,
            num_outputs=4,
            num_anchors=self.num_anchors,
            final_bias_init=None,
            anchor_major_split=False,
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            dtype=self.dtype,
            fuse_bn=self.fuse_bn,
            name="net",
        )(feats, use_running_average, return_raw_levels,
          return_anchor_major_levels)
