"""Core on-device ops: IoU, NMS, preprocessing, resampling, fused kernels."""

from efficientdet_tpu.anchors import iou_matrix  # re-export for convenience
from efficientdet_tpu.ops.nms import filter_detections, batched_filter_detections
from efficientdet_tpu.ops.preprocess import (
    preprocess_image,
    preprocess_batch_fixed,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from efficientdet_tpu.ops.resample import upsample_nearest_2x, downsample_maxpool
