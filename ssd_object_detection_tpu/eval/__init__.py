"""Evaluation: jitted batched prediction (decode+NMS) and COCO-style mAP."""

from ssd_object_detection_tpu.eval.predict import make_predict_fn  # noqa: F401
from ssd_object_detection_tpu.eval.coco_map import DetectionEvaluator  # noqa: F401
