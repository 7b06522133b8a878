"""Evaluation: self-written COCOeval (pycocotools-free) + VOC-style mAP."""

from efficientdet_tpu.evaluation.coco_eval import CocoEvaluator, evaluate_coco
from efficientdet_tpu.evaluation.voc import evaluate_voc
