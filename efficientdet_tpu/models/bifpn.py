"""BiFPN: bidirectional feature pyramid with fast-normalised weighted fusion.

Rebuild of the reference's ``build_wBiFPN``/``build_BiFPN`` in ``model.py``
plus the ``wBiFPNAdd`` custom layer in ``layers.py`` (SURVEY.md SS2 "BiFPN +
detector assembly", "Custom layers"). Topology per layer (paper Fig. 2):

  inputs (first layer only): P3..P5 from 1x1 channel-matching conv+BN of
  C3..C5 (P4/P5 get *two* independent 1x1 convs — one for the top-down node,
  one for the bottom-up skip, as in the reference); P6 = maxpool3x3/s2 of
  conv+BN(C5); P7 = maxpool3x3/s2 of P6.

  top-down:    P6td = F(P6, up(P7)) ... P3out = F(P3, up(P4td))
  bottom-up:   P4out = F(P4, P4td, down(P3out)) ... P7out = F(P7, down(P6out))

where F = fast-normalised fusion (w=relu(w); sum(w_i x_i)/(sum w + eps),
eps=1e-4) -> swish -> SeparableConv 3x3 -> BN. With ``weighted=False`` the
fusion is a plain sum (the reference's unweighted variant used by D6/D7).

All ops are NHWC and XLA-fusion friendly; the fusion + sepconv node is the
SURVEY.md SS7 Pallas candidate, kept in pure XLA until profiling shows a gap.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdet_tpu.models.normalization import TpuBatchNorm
from efficientdet_tpu.ops.resample import downsample_maxpool, upsample_to

Dtype = Any

FUSION_EPS = 1e-4


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (keras SeparableConv2D equivalent)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            bias_init=self.bias_init,
            name="pointwise",
        )(x)
        return x


class FusedNode(nn.Module):
    """One BiFPN node: fuse -> swish -> sepconv -> BN."""

    features: int
    num_inputs: int
    weighted: bool = True
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    fuse_bn: bool = False  # inference-folded variant (utils/fold_bn.py)

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], use_running_average: bool = True) -> jax.Array:
        assert len(inputs) == self.num_inputs
        if self.weighted:
            w = self.param(
                "fusion_weights",
                nn.initializers.ones,
                (self.num_inputs,),
                jnp.float32,
            )
            w = jax.nn.relu(w)
            norm = jnp.sum(w) + FUSION_EPS
            x = sum(
                (w[i] / norm).astype(inputs[i].dtype) * inputs[i]
                for i in range(self.num_inputs)
            )
        else:
            x = sum(inputs)
        x = nn.swish(x)
        x = SeparableConv(self.features, dtype=self.dtype, name="conv")(x)
        if not self.fuse_bn:
            x = TpuBatchNorm(
                use_running_average=use_running_average,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                name="bn",
            )(x)
        return x


class BiFPNLayer(nn.Module):
    """One bidirectional pass over P3..P7."""

    features: int
    first: bool  # first layer builds P6/P7 and channel-matching convs
    weighted: bool = True
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    fuse_bn: bool = False

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], use_running_average: bool = True
    ) -> List[jax.Array]:
        def conv_bn(x, name):
            x = nn.Conv(
                self.features, (1, 1), dtype=self.dtype, name=f"{name}_conv"
            )(x)
            if self.fuse_bn:
                return x
            return TpuBatchNorm(
                use_running_average=use_running_average,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                name=f"{name}_bn",
            )(x)

        if self.first:
            c3, c4, c5 = feats
            p3_in = conv_bn(c3, "p3_in")
            p4_in_td = conv_bn(c4, "p4_in_td")
            p4_in_bu = conv_bn(c4, "p4_in_bu")
            p5_in_td = conv_bn(c5, "p5_in_td")
            p5_in_bu = conv_bn(c5, "p5_in_bu")
            p6_in = downsample_maxpool(conv_bn(c5, "p6_in"))
            p7_in = downsample_maxpool(p6_in)
        else:
            p3_in, p4_in_td, p5_in_td, p6_in, p7_in = feats
            p4_in_bu, p5_in_bu = p4_in_td, p5_in_td

        def node(name, n, weighted=None):
            return FusedNode(
                features=self.features,
                num_inputs=n,
                weighted=self.weighted if weighted is None else weighted,
                bn_momentum=self.bn_momentum,
                bn_epsilon=self.bn_epsilon,
                dtype=self.dtype,
                fuse_bn=self.fuse_bn,
                name=name,
            )

        def up(x, like):
            return upsample_to(x, like.shape[1], like.shape[2])

        ura = use_running_average
        # Top-down pathway.
        p6_td = node("p6_td", 2)([p6_in, up(p7_in, p6_in)], ura)
        p5_td = node("p5_td", 2)([p5_in_td, up(p6_td, p5_in_td)], ura)
        p4_td = node("p4_td", 2)([p4_in_td, up(p5_td, p4_in_td)], ura)
        p3_out = node("p3_out", 2)([p3_in, up(p4_td, p3_in)], ura)
        # Bottom-up pathway.
        p4_out = node("p4_out", 3)(
            [p4_in_bu, p4_td, downsample_maxpool(p3_out)], ura
        )
        p5_out = node("p5_out", 3)(
            [p5_in_bu, p5_td, downsample_maxpool(p4_out)], ura
        )
        p6_out = node("p6_out", 3)([p6_in, p6_td, downsample_maxpool(p5_out)], ura)
        p7_out = node("p7_out", 2)([p7_in, downsample_maxpool(p6_out)], ura)
        return [p3_out, p4_out, p5_out, p6_out, p7_out]


class BiFPN(nn.Module):
    """Stack of ``depth`` BiFPN layers: (C3, C4, C5) -> [P3..P7]."""

    features: int
    depth: int
    weighted: bool = True
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    fuse_bn: bool = False
    # Rematerialise each BiFPN layer in the backward pass (ModelConfig.remat).
    remat: bool = False

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], use_running_average: bool = True
    ) -> List[jax.Array]:
        # (self, feats, use_running_average) -> static argnum 2.
        Layer = (
            nn.remat(BiFPNLayer, static_argnums=(2,))
            if self.remat
            else BiFPNLayer
        )
        for i in range(self.depth):
            feats = Layer(
                features=self.features,
                first=(i == 0),
                weighted=self.weighted,
                bn_momentum=self.bn_momentum,
                bn_epsilon=self.bn_epsilon,
                dtype=self.dtype,
                fuse_bn=self.fuse_bn,
                name=f"layer{i}",
            )(feats, use_running_average)
        return list(feats)
