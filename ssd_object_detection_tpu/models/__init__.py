"""Flax model definitions: VGG-16 / ResNet-34 / MobileNetV2 trunks + SSD heads."""

from ssd_object_detection_tpu.models.mobilenet import MobileNetV2Trunk  # noqa: F401
from ssd_object_detection_tpu.models.resnet import ResNet34Trunk  # noqa: F401
from ssd_object_detection_tpu.models.ssd import (  # noqa: F401
    SSD, SSD300_MNV2_SPEC_MODEL, SSD300_R34_SPEC_MODEL, SSD300_SPEC_MODEL,
    SSD512_SPEC_MODEL, ModelSpec,
)
from ssd_object_detection_tpu.models.vgg import VGG16Trunk  # noqa: F401
