"""Flax model definitions: VGG-16 trunk + SSD multi-scale detection heads."""

from ssd_object_detection_tpu.models.ssd import SSD, SSD300_SPEC_MODEL, SSD512_SPEC_MODEL, ModelSpec  # noqa: F401
from ssd_object_detection_tpu.models.vgg import VGG16Trunk  # noqa: F401
