"""Typed configuration for EfficientDet-TPU.

Replaces the reference's hardcoded per-phi tuples in ``model.py`` and the
argparse-only flag system of ``train.py`` (see SURVEY.md SS2 "Training CLI",
SS5 "Config / flag system"; reference structure per SURVEY.md — the reference
mount was empty, so citations are to the survey's component inventory).

Everything is a frozen dataclass so configs hash and can be closed over by
``jax.jit`` as static arguments.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


# ---------------------------------------------------------------------------
# EfficientNet compound-scaling coefficients (paper arXiv 1905.11946 Table 1;
# SURVEY.md SS2 "EfficientNet backbone").
# name -> (width_coefficient, depth_coefficient, dropout_rate)
# ---------------------------------------------------------------------------
EFFICIENTNET_PARAMS = {
    "efficientnet-tiny": (1.0, 1.0, 0.2),  # smoke-path table, see below
    "efficientnet-b0": (1.0, 1.0, 0.2),
    "efficientnet-b1": (1.0, 1.1, 0.2),
    "efficientnet-b2": (1.1, 1.2, 0.3),
    "efficientnet-b3": (1.2, 1.4, 0.3),
    "efficientnet-b4": (1.4, 1.8, 0.4),
    "efficientnet-b5": (1.6, 2.2, 0.4),
    "efficientnet-b6": (1.8, 2.6, 0.5),
    "efficientnet-b7": (2.0, 3.1, 0.5),
}


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    """One EfficientNet MBConv stage (SURVEY.md SS2 B0 stage table)."""

    kernel_size: int
    num_repeat: int
    input_filters: int
    output_filters: int
    expand_ratio: int
    strides: int
    se_ratio: float = 0.25


# EfficientNet-B0 baseline stage table (SURVEY.md SS2; arXiv 1905.11946).
EFFICIENTNET_B0_BLOCKS: Tuple[BlockConfig, ...] = (
    BlockConfig(3, 1, 32, 16, 1, 1),
    BlockConfig(3, 2, 16, 24, 6, 2),
    BlockConfig(5, 2, 24, 40, 6, 2),   # <- C3 tap after this stage (stride 8)
    BlockConfig(3, 3, 40, 80, 6, 2),
    BlockConfig(5, 3, 80, 112, 6, 1),  # <- C4 tap (stride 16)
    BlockConfig(5, 4, 112, 192, 6, 2),
    BlockConfig(3, 1, 192, 320, 6, 1),  # <- C5 tap (stride 32)
)

# Minimal 7-stage table for compile-bounded smoke paths (driver dryrun,
# budget-tight CI): one block per stage, narrow filters, the same stride
# pattern and C3/C4/C5 tap positions as B0 so every downstream shape
# contract (BiFPN inputs, anchor levels) is exercised. NOT a real model —
# it exists because a full B0 train-step compile costs ~5 min on a 1-core
# CPU host while the driver's dryrun window is ~11 min total (VERDICT r3
# missing #1); sharding semantics are identical regardless of stage table.
EFFICIENTNET_TINY_BLOCKS: Tuple[BlockConfig, ...] = (
    BlockConfig(3, 1, 8, 8, 1, 1),
    BlockConfig(3, 1, 8, 8, 6, 2),
    BlockConfig(5, 1, 8, 16, 6, 2),    # <- C3 tap (stride 8)
    BlockConfig(3, 1, 16, 16, 1, 2),
    BlockConfig(5, 1, 16, 24, 6, 1),   # <- C4 tap (stride 16)
    BlockConfig(5, 1, 24, 24, 1, 2),
    BlockConfig(3, 1, 24, 32, 6, 1),   # <- C5 tap (stride 32)
)

# model name -> stage table; "efficientnet-tiny" scales as B0 (1.0/1.0).
BACKBONE_BLOCK_TABLES = {
    name: EFFICIENTNET_B0_BLOCKS for name in EFFICIENTNET_PARAMS
}
BACKBONE_BLOCK_TABLES["efficientnet-tiny"] = EFFICIENTNET_TINY_BLOCKS


def round_filters(filters: int, width_coefficient: float, divisor: int = 8) -> int:
    """Round number of filters after width scaling (paper SS5.2 convention)."""
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:  # avoid rounding down by >10%
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    """Round number of block repeats after depth scaling."""
    return int(math.ceil(depth_coefficient * repeats))


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor layout (SURVEY.md SS2 "Anchors": ``AnchorParameters.default``).

    ``sizes`` are derived as ``anchor_scale * stride`` which reproduces the
    reference defaults [32, 64, 128, 256, 512] at anchor_scale=4.
    """

    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    ratios: Tuple[float, ...] = (1.0, 0.5, 2.0)
    scales: Tuple[float, ...] = (2 ** 0.0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0))
    anchor_scale: float = 4.0

    @property
    def sizes(self) -> Tuple[float, ...]:
        return tuple(self.anchor_scale * s for s in self.strides)

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.ratios) * len(self.scales)


# Per-phi detector scaling (SURVEY.md SS2 per-phi table; paper Table 1).
# phi -> (image_size, backbone, bifpn_width, bifpn_depth, head_depth,
#         anchor_scale)
_PHI_CONFIGS = {
    0: (512, "efficientnet-b0", 64, 3, 3, 4.0),
    1: (640, "efficientnet-b1", 88, 4, 3, 4.0),
    2: (768, "efficientnet-b2", 112, 5, 3, 4.0),
    3: (896, "efficientnet-b3", 160, 6, 4, 4.0),
    4: (1024, "efficientnet-b4", 224, 7, 4, 4.0),
    5: (1280, "efficientnet-b5", 288, 7, 4, 4.0),
    6: (1280, "efficientnet-b6", 384, 8, 5, 4.0),
    7: (1536, "efficientnet-b6", 384, 8, 5, 5.0),
}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full detector configuration for one phi (D0..D7)."""

    phi: int
    image_size: int
    backbone: str
    bifpn_width: int
    bifpn_depth: int
    head_depth: int
    num_classes: int = 90
    weighted_bifpn: bool = True
    freeze_bn: bool = False
    min_level: int = 3
    max_level: int = 7
    anchor: AnchorConfig = AnchorConfig()
    # Backbone regularisation.
    survival_prob: float = 0.8  # drop-connect keep prob at the deepest block
    # Rematerialise blocks in the backward pass (jax.checkpoint): trades
    # ~1 extra forward of FLOPs for activation memory, the lever that fits
    # D4+ *training* on a single chip's HBM.
    remat: bool = False
    # Which components remat applies to: "full" (backbone + BiFPN + heads),
    # "backbone" (MBConv blocks only — BiFPN/head activations saved), or
    # "fpn" (BiFPN + heads only — backbone taps saved). Selective scopes
    # skip recompute where activations are cheap relative to FLOPs.
    remat_scope: str = "full"
    # Backbone stages (1-based) above this are NOT rematted even when remat
    # covers the backbone: stride-16/32 activations are cheap to store and
    # saving them skips their backward recompute (D4 b16 trace: ~18 ms).
    remat_max_stage: int = 7
    # Numerics.
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3

    @classmethod
    def for_phi(
        cls,
        phi: int,
        num_classes: int = 90,
        weighted_bifpn: bool | None = None,
        freeze_bn: bool = False,
        image_size: int | None = None,
    ) -> "ModelConfig":
        """Build the per-phi config.

        ``weighted_bifpn=None`` (default) follows the reference lineage:
        fast-normalised weighted fusion for D0–D5, UNWEIGHTED sum fusion
        for D6/D7 (SURVEY.md §2 "BiFPN": the softmax/fast-norm weights are
        dropped at the largest scales for stability). Pass True/False to
        override explicitly.
        """
        if phi not in _PHI_CONFIGS:
            raise ValueError(f"phi must be in 0..7, got {phi}")
        size, backbone, w, d, hd, anchor_scale = _PHI_CONFIGS[phi]
        if weighted_bifpn is None:
            weighted_bifpn = phi < 6
        if image_size is not None:
            size = image_size
        if size % 128 != 0:
            raise ValueError(
                f"image_size must be divisible by 128 (stride of P7), got {size}"
            )
        return cls(
            phi=phi,
            image_size=size,
            backbone=backbone,
            bifpn_width=w,
            bifpn_depth=d,
            head_depth=hd,
            num_classes=num_classes,
            weighted_bifpn=weighted_bifpn,
            freeze_bn=freeze_bn,
            anchor=AnchorConfig(anchor_scale=anchor_scale),
        )

    @property
    def num_levels(self) -> int:
        return self.max_level - self.min_level + 1

    @property
    def num_anchors_per_cell(self) -> int:
        return self.anchor.num_anchors_per_cell

    def feature_shapes(self, image_size: int | None = None):
        """(H, W) of P3..P7 for a square input."""
        size = image_size or self.image_size
        return [
            (size // (2 ** lvl), size // (2 ** lvl))
            for lvl in range(self.min_level, self.max_level + 1)
        ]

    def total_anchors(self, image_size: int | None = None) -> int:
        return sum(
            h * w * self.num_anchors_per_cell
            for h, w in self.feature_shapes(image_size)
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (SURVEY.md SS2 "Training CLI" defaults)."""

    batch_size: int = 8
    learning_rate: float = 1e-3
    epochs: int = 50
    steps_per_epoch: int = 10000
    # Loss (SURVEY.md SS2 "Losses").
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    huber_sigma: float = 3.0
    # Anchor matching (SURVEY.md SS2 "Anchors").
    positive_iou: float = 0.5
    negative_iou: float = 0.4
    max_gt_boxes: int = 100
    # Optimisation extras (new-build additions, off by default for parity).
    weight_decay: float = 0.0
    grad_clip_norm: float = 0.0
    # >1: optax.MultiSteps gradient accumulation — effective batch =
    # grad_accum_steps * batch_size at constant activation memory.
    grad_accum_steps: int = 1
    ema_decay: float = 0.0
    freeze_backbone: bool = False
    # Run the optimiser update over ONE flattened parameter vector
    # (optax.flatten) instead of ~360 per-tensor leaves. The round-2 D0/b128
    # device trace showed the leaf-wise Adam costing 26 ms/step (11% of the
    # step) in hundreds of tiny f32[k] kLoop fusions whose roofline is
    # ~0.2 ms — per-op fixed cost, not bandwidth. Mathematically identical
    # for our chain (global-norm clip, uniform decay, Adam are all
    # elementwise/global over the flat vector). MEASURED A/B on-chip
    # (round 3, D0/b128 bf16): leaf-wise 524.9 img/s vs flattened 497.2 —
    # the per-step ravel+concat of every grad leaf and split+reshape of
    # every update costs MORE fixed-overhead ops than the single big Adam
    # saves (docs/DESIGN.md 6f). Default False (leaf-wise); the flag stays
    # because it changes the opt_state PYTREE STRUCTURE: snapshots record
    # it and restore paths match it (train.py resume + evaluate.py both
    # consult train_config.json).
    fused_optimizer: bool = False
    # lr schedule: 'constant' mirrors reference Adam(1e-3) + ReduceLROnPlateau
    # (plateau logic lives in the host loop); 'cosine' is the TPU-native path.
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    # Compute the loss from per-level head conv outputs instead of the
    # concatenated (B, A_total, C) tensor. Same math (tested identical);
    # avoids the two largest train-step allocations at D4/b16 (level concat
    # + anchor-major reshape copies). False = reference-shaped concat path.
    per_level_loss: bool = True
    # Run random affine + colour augmentation ON DEVICE inside the jitted
    # train step (ops/augment.py) instead of per-image on the host. The
    # host's per-image work drops to decode + letterbox — the TPU-native
    # answer to a 1-core host feeding a many-chip mesh. Off by default:
    # the host path is the reference-shaped default.
    device_augment: bool = False
    device_augment_color: bool = True


def train_config_from_snapshot(saved_cfg) -> "TrainConfig":
    """Rebuild the TrainConfig a snapshot was written with.

    Restore paths must reproduce the snapshot's opt_state pytree structure
    exactly (orbax refuses mismatches). Snapshots written before
    ``fused_optimizer`` existed — or with no ``train_config.json`` at all —
    have the old leaf-wise structure, so the field defaults to False here
    explicitly rather than trusting the dataclass default.
    """
    if saved_cfg is None:
        return TrainConfig(fused_optimizer=False)
    return TrainConfig(**{"fused_optimizer": False, **saved_cfg["train"]})


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Detection filtering (SURVEY.md SS2 "Custom layers": FilterDetections)."""

    score_threshold: float = 0.01
    nms_iou_threshold: float = 0.5
    max_detections: int = 100
    # 1024 (not the customary 1000): multiple of the 128-lane TPU tile, which
    # both the Pallas suppression kernel and XLA's top_k prefer.
    pre_nms_top_k: int = 1024
    # Per-anchor class cap before the pair top-k. XLA lowers top_k as a full
    # sort; capping each anchor to its best 16 classes shrinks that sort from
    # K*C to K*16 elements (~3x NMS selection time at C=90). Exact whenever
    # C <= 16; beyond that, a candidate is lost only if >=17 classes of ONE
    # anchor box would all rank in the global top-K pool — not a real
    # detection pattern. Set >= num_classes for strict reference semantics.
    per_anchor_top_c: int = 16
    # Anchor prefilter via lax.approx_max_k (TPU PartialReduce) instead of
    # top_k's full sort: 7.2 -> 3.3 ms at (128, 49104) on v5e. A top-ranked
    # anchor is lost only when a HIGHER-scoring anchor lands in its reduction
    # bin, so the top-100 detections are essentially unaffected (the op
    # guarantees >=0.95 recall over the whole top-1024 pool); on CPU the op
    # lowers to an exact sort, so CPU oracle tests see identical values.
    # Set False for strict exact-top-k semantics on TPU.
    approx_anchor_prefilter: bool = True

    @classmethod
    def exact(cls, num_classes: int = 90, **overrides) -> "EvalConfig":
        """Parity-exact preset: NO approximations anywhere in the NMS path.

        ``per_anchor_top_c >= num_classes`` disables the per-anchor class cap
        and ``approx_anchor_prefilter=False`` replaces ``lax.approx_max_k``
        with an exact full-sort top-k, so selection semantics match the
        reference's FilterDetections bit-for-bit modulo float order. This is
        the default for the mAP-measuring eval CLI (BASELINE.json:5 "mAP
        within 0.2"); the fast defaults above are for serving/training-loop
        monitoring. Measured delta of the fast mode on adversarial synthetic
        logits: see tests/test_nms.py::TestExactVsFastEval.
        """
        return cls(
            per_anchor_top_c=max(num_classes, 1),
            approx_anchor_prefilter=False,
            **overrides,
        )
