"""Flax model definitions: EfficientNet backbone, BiFPN, heads, detector."""

from efficientdet_tpu.models.efficientnet import EfficientNet
from efficientdet_tpu.models.bifpn import BiFPN
from efficientdet_tpu.models.heads import ClassNet, BoxNet
from efficientdet_tpu.models.detector import (
    EfficientDet,
    build_efficientdet,
    efficientdet_d0,
    efficientdet_d1,
    efficientdet_d2,
    efficientdet_d3,
    efficientdet_d4,
    efficientdet_d5,
    efficientdet_d6,
    efficientdet_d7,
)
