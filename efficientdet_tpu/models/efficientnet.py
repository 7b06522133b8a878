"""EfficientNet-B0..B7 backbone in Flax (NHWC, TPU-native).

Rebuild of the reference's ``efficientnet.py`` (SURVEY.md SS2 "EfficientNet
backbone"): stem 3x3/s2 conv; 7 MBConv stages with compound
``round_filters``/``round_repeats`` scaling; squeeze-excite ratio 0.25; swish
activation; per-block stochastic depth (drop-connect); feature taps C3
(stride 8), C4 (stride 16), C5 (stride 32).

TPU-first choices: NHWC layout throughout (XLA's preferred conv layout on
TPU); BatchNorm in float32 regardless of compute dtype; depthwise convs via
``feature_group_count`` which XLA lowers to efficient TPU depthwise
convolutions. The classification head of the original network is omitted —
the detector only consumes C3..C5 (the reference likewise discards it).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientdet_tpu.configs import (
    BACKBONE_BLOCK_TABLES,
    EFFICIENTNET_PARAMS,
    BlockConfig,
    round_filters,
    round_repeats,
)
from efficientdet_tpu.models.normalization import TpuBatchNorm

Dtype = Any

# Keras/TF-style variance-scaling init used by the original EfficientNet.
conv_kernel_init = nn.initializers.variance_scaling(
    2.0, mode="fan_out", distribution="truncated_normal"
)


class SqueezeExcite(nn.Module):
    """SE block: global-avg-pool -> reduce 1x1 -> swish -> expand 1x1 -> sigmoid."""

    num_reduced: int
    num_filters: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        if h * w <= 4096:
            # Small-spatial squeeze: XLA's convert+reduce fusion runs at
            # ~110-220 GB/s here (device trace/microbench, DESIGN.md 6b);
            # contracting with a ones-vector on the MXU (f32 accumulation,
            # same math) measures 15-20% faster. Large maps prefer the
            # plain reduce (374 vs 349 GB/s at 128x128) — keep both.
            ones = jnp.ones((h * w,), x.dtype)
            se = jax.lax.dot_general(
                ones,
                x.reshape(b, h * w, c),
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / (h * w)
            se = se.reshape(b, 1, 1, c).astype(x.dtype)
        else:
            se = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        se = nn.Conv(
            self.num_reduced, (1, 1), kernel_init=conv_kernel_init,
            dtype=self.dtype, name="reduce",
        )(se)
        se = nn.swish(se)
        se = nn.Conv(
            self.num_filters, (1, 1), kernel_init=conv_kernel_init,
            dtype=self.dtype, name="expand",
        )(se)
        return x * jax.nn.sigmoid(se)


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck: expand 1x1 -> depthwise kxk -> SE -> project 1x1."""

    config: BlockConfig
    input_filters: int
    output_filters: int
    strides: int
    survival_prob: float  # stochastic-depth keep probability (1.0 = off)
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    # fuse_bn=True builds the inference-folded variant: convs carry a bias
    # and no BatchNorm ops exist (params produced by utils/fold_bn.py from a
    # trained tree). Measured ~1.8x on the bandwidth-bound early stages.
    fuse_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, use_running_average: bool = True) -> jax.Array:
        cfg = self.config
        inputs = x
        filters = self.input_filters * cfg.expand_ratio
        fused = self.fuse_bn

        def bn(name):
            if fused:
                return lambda y: y
            return TpuBatchNorm(
                use_running_average=use_running_average,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                name=name,
            )

        if cfg.expand_ratio != 1:
            x = nn.Conv(
                filters, (1, 1), use_bias=fused, kernel_init=conv_kernel_init,
                dtype=self.dtype, name="expand_conv",
            )(x)
            x = bn("expand_bn")(x).astype(self.dtype)
            x = nn.swish(x)

        # Depthwise conv: feature_group_count == channels.
        x = nn.Conv(
            filters,
            (cfg.kernel_size, cfg.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            feature_group_count=filters,
            use_bias=fused,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="depthwise_conv",
        )(x)
        x = bn("depthwise_bn")(x).astype(self.dtype)
        x = nn.swish(x)

        if 0 < cfg.se_ratio <= 1:
            num_reduced = max(1, int(self.input_filters * cfg.se_ratio))
            x = SqueezeExcite(
                num_reduced, filters, dtype=self.dtype, name="se"
            )(x)

        x = nn.Conv(
            self.output_filters, (1, 1), use_bias=fused,
            kernel_init=conv_kernel_init, dtype=self.dtype, name="project_conv",
        )(x)
        x = bn("project_bn")(x).astype(self.dtype)

        if self.strides == 1 and self.input_filters == self.output_filters:
            if train and self.survival_prob < 1.0:
                # Per-sample stochastic depth (reference drop-connect 0.2).
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(
                    rng, self.survival_prob, (x.shape[0], 1, 1, 1)
                ).astype(x.dtype)
                x = x * keep / self.survival_prob
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """Backbone returning (C3, C4, C5) feature taps.

    ``model_name`` in 'efficientnet-b0'..'-b7' selects compound scaling.
    """

    model_name: str = "efficientnet-b0"
    survival_prob: float = 0.8
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32
    fuse_bn: bool = False  # inference-folded variant (see utils/fold_bn.py)
    # jax.checkpoint each MBConv block: backward recomputes the block's
    # forward instead of keeping its expanded (6x-channel) intermediates
    # live — fits D4+ training in one chip's HBM (ModelConfig.remat).
    remat: bool = False
    # Only remat stages <= this (1-based). High-res stages (1-3) hold the
    # multi-hundred-MB intermediates worth recomputing; the stride-16/32
    # stages (4-7) are cheap to store, and saving them skips their
    # recompute pass in the backward (D4 trace: ~18 ms/step at b16).
    remat_max_stage: int = 7

    @nn.compact
    def __call__(
        self, images: jax.Array, train: bool = False, use_running_average: bool | None = None
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if use_running_average is None:
            use_running_average = not train
        width, depth, _ = EFFICIENTNET_PARAMS[self.model_name]
        block_table = BACKBONE_BLOCK_TABLES[self.model_name]

        def bn(name):
            if self.fuse_bn:
                return lambda y: y
            return TpuBatchNorm(
                use_running_average=use_running_average,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                name=name,
            )

        x = images.astype(self.dtype)
        x = nn.Conv(
            # Stem width == first block's input width (32 for B0..B7).
            round_filters(block_table[0].input_filters, width),
            (3, 3), strides=(2, 2), padding="SAME",
            use_bias=self.fuse_bn, kernel_init=conv_kernel_init,
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = bn("stem_bn")(x).astype(self.dtype)
        x = nn.swish(x)

        total_blocks = sum(
            round_repeats(b.num_repeat, depth) for b in block_table
        )
        drop_rate = 1.0 - self.survival_prob
        # (self, x, train, use_running_average) -> statics are argnums 2, 3.
        RematBlock = nn.remat(MBConvBlock, static_argnums=(2, 3))
        taps = {}
        block_idx = 0
        for stage_idx, block_cfg in enumerate(block_table):
            Block = (
                RematBlock
                if self.remat and stage_idx + 1 <= self.remat_max_stage
                else MBConvBlock
            )
            in_f = round_filters(block_cfg.input_filters, width)
            out_f = round_filters(block_cfg.output_filters, width)
            repeats = round_repeats(block_cfg.num_repeat, depth)
            for r in range(repeats):
                # Linearly-scaled stochastic depth over block index.
                survival = 1.0 - drop_rate * block_idx / total_blocks
                x = Block(
                    config=block_cfg,
                    input_filters=in_f if r == 0 else out_f,
                    output_filters=out_f,
                    strides=block_cfg.strides if r == 0 else 1,
                    survival_prob=survival,
                    bn_momentum=self.bn_momentum,
                    bn_epsilon=self.bn_epsilon,
                    dtype=self.dtype,
                    fuse_bn=self.fuse_bn,
                    name=f"stage{stage_idx + 1}_block{r}",
                )(x, train, use_running_average)  # positional: remat statics
                block_idx += 1
            # Taps after stages 3 (stride 8), 5 (stride 16), 7 (stride 32).
            if stage_idx == 2:
                taps["C3"] = x
            elif stage_idx == 4:
                taps["C4"] = x
            elif stage_idx == 6:
                taps["C5"] = x
        return taps["C3"], taps["C4"], taps["C5"]
