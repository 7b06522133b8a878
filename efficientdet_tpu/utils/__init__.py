"""Host-side utilities: image IO/drawing, checkpointing, profiling."""

from efficientdet_tpu.utils.image import draw_detections, read_image_rgb
