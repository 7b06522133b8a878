"""efficientdet_tpu: a TPU-native EfficientDet framework in JAX/XLA.

Built from scratch against the capability surface of the reference repo
``Ely-S/EfficientDet`` (see SURVEY.md; the reference mount was empty, so the
survey + BASELINE.json are the spec of record). Compute path is
JAX/XLA/Pallas with pjit sharding; host runtime (data loading, COCO eval,
C++ IoU host op) lives under ``data/``, ``evaluation/``, ``cc/``.
"""

__version__ = "0.1.0"

from efficientdet_tpu.configs import (
    AnchorConfig,
    EvalConfig,
    ModelConfig,
    TrainConfig,
)
from efficientdet_tpu.anchors import (
    anchors_for_shape,
    anchor_targets,
    anchor_targets_batch,
    anchor_targets_batch_compact,
    anchor_targets_compact,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    iou_matrix,
)
from efficientdet_tpu.losses import detection_loss, focal_loss, smooth_l1_loss
from efficientdet_tpu.models import (
    BiFPN,
    BoxNet,
    ClassNet,
    EfficientDet,
    EfficientNet,
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
from efficientdet_tpu.models.detector import make_predict_fn, predict_pipeline
from efficientdet_tpu.export import load_exported, save_exported
