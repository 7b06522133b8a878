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

Dtype = Any


def prior_prob_bias(prior: float = 0.01):
    """Reference PriorProbability initializer: bias = -log((1-pi)/pi)."""
    value = -math.log((1.0 - prior) / prior)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


class _Head(nn.Module):
    """Common structure for ClassNet/BoxNet."""

    width: int
    depth: int
    num_outputs: int  # per-anchor outputs of the final conv
    num_anchors: int
    final_bias_init: Any  # flax bias initializer for the final pointwise
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
        final = SeparableConv(
            self.num_outputs * self.num_anchors, dtype=self.dtype,
            bias_init=self.final_bias_init or nn.initializers.zeros,
            name="final",
        )
        outputs = []
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
                    x = nn.BatchNorm(
                        use_running_average=use_running_average,
                        momentum=self.bn_momentum,
                        epsilon=self.bn_epsilon,
                        dtype=jnp.float32,
                        name=f"bn_l{lvl}_d{i}",
                    )(x).astype(self.dtype)
                x = nn.swish(x)
            x = final(x)
            if return_raw_levels:
                outputs.append(x)  # (B, H, W, A*num_outputs) conv layout
                continue
            b, h, w, _ = x.shape
            outputs.append(x.reshape(b, h * w * self.num_anchors, self.num_outputs))
        if return_raw_levels:
            # NHWC conv layout, no anchor-major reshape: the per-level NMS
            # prefilter consumes this directly (the reshape+concat to
            # (B, A, C) cost ~10 ms/step at D0/b128 per the device trace).
            return outputs
        return jnp.concatenate(outputs, axis=1)  # (B, A_total, num_outputs)


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

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        use_running_average: bool = True,
        return_raw_levels: bool = False,
    ) -> jax.Array:
        return _Head(
            width=self.width,
            depth=self.depth,
            num_outputs=self.num_classes,
            num_anchors=self.num_anchors,
            final_bias_init=prior_prob_bias(self.prior),
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            dtype=self.dtype,
            fuse_bn=self.fuse_bn,
            name="net",
        )(feats, use_running_average, return_raw_levels)


class BoxNet(nn.Module):
    """Box regression head -> (B, A, 4) encoded deltas."""

    width: int
    depth: int
    num_anchors: int = 9
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jax.Array],
        use_running_average: bool = True,
        return_raw_levels: bool = False,
    ) -> jax.Array:
        return _Head(
            width=self.width,
            depth=self.depth,
            num_outputs=4,
            num_anchors=self.num_anchors,
            final_bias_init=None,
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            dtype=self.dtype,
            fuse_bn=self.fuse_bn,
            name="net",
        )(feats, use_running_average, return_raw_levels)
