"""Data pipelines: COCO (own JSON index, no pycocotools) + hermetic synthetic data."""

from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset  # noqa: F401
