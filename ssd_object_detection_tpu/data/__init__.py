"""Data pipelines: COCO (own JSON index, no pycocotools), packed decode-once cache,
hermetic synthetic data."""

from ssd_object_detection_tpu.data.packed import PackedConfig, PackedPipeline, pack_dataset  # noqa: F401
from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset  # noqa: F401
