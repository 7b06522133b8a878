"""Datasets and input pipeline: COCO / Pascal VOC / CSV + augmentation."""

from efficientdet_tpu.data.common import DetectionDataset, batch_iterator
from efficientdet_tpu.data.device_cache import DeviceDataCache
from efficientdet_tpu.data.csv_ import CsvDataset
from efficientdet_tpu.data.coco import CocoDataset
from efficientdet_tpu.data.pascal import PascalVocDataset
