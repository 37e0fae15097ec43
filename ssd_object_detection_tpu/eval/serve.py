"""Serving export: freeze the jitted detection function to a portable StableHLO
artifact (jax.export) that reloads and runs without the model-building python code.

New capability — the reference has no inference/serve path at all (SURVEY.md: "no
inference/serve CLI"). The artifact bundles params as constants, so a serving process
needs only jax + the artifact bytes.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ssd_object_detection_tpu.eval.predict import make_predict_fn
from ssd_object_detection_tpu.ops.nms import Detections

logger = logging.getLogger(__name__)

# Detections is a NamedTuple; register it once so exported functions can return it.
try:
    jax_export.register_namedtuple_serialization(
        Detections, serialized_name="ssd_object_detection_tpu.Detections"
    )
except ValueError:  # already registered (repeated import in tests)
    pass


def export_detector(
    apply_fn,
    params,
    anchors,
    batch_size: int,
    image_size: int,
    variances: Optional[Tuple[float, float]] = None,
    platforms: Optional[Tuple[str, ...]] = None,
    **nms_kwargs,
) -> bytes:
    """Serialize predict(images01) for a fixed batch/image size to StableHLO bytes.

    `platforms` defaults to the current backend; pass ("tpu", "cpu") for a
    multi-platform artifact.
    """
    predict = make_predict_fn(apply_fn, anchors, variances=variances, **nms_kwargs)

    def detect(images01):
        return predict(params, images01)

    spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3), jnp.float32)
    exported = jax_export.export(jax.jit(detect), platforms=platforms)(spec)
    blob = bytes(exported.serialize())
    logger.info("exported detector: %d bytes, platforms=%s", len(blob), exported.platforms)
    return blob


def export_fused_detector(
    apply_fn,
    params,
    anchors,
    batch_size: int,
    image_size: int,
    canvas_hw: Tuple[int, int] = (640, 640),
    variances: Optional[Tuple[float, float]] = None,
    platforms: Optional[Tuple[str, ...]] = None,
    **nms_kwargs,
) -> bytes:
    """Serialize the FUSED serving contract (BASELINE config #2): the artifact takes
    a planar uint8 canvas (B, 3, Hc, Wc) + per-image (h, w) sizes and performs
    on-device resize -> normalize -> forward -> decode -> NMS. A serving process
    keeps only JPEG decode + ops/preprocess.pack_canvas on the host.

    Extra kwargs reach make_fused_predict_fn, so exports can pin NMS knobs or opt
    into the exact-arithmetic resize (resize_method="gather") for bit-stable
    artifact reproducibility without editing library code."""
    from ssd_object_detection_tpu.eval.predict import make_fused_predict_fn

    predict = make_fused_predict_fn(
        apply_fn, anchors, image_size=image_size, variances=variances, **nms_kwargs
    )

    def detect(canvas_u8, sizes):
        return predict(params, canvas_u8, sizes)

    hc, wc = canvas_hw
    specs = (
        jax.ShapeDtypeStruct((batch_size, 3, hc, wc), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, 2), jnp.int32),
    )
    exported = jax_export.export(jax.jit(detect), platforms=platforms)(*specs)
    blob = bytes(exported.serialize())
    logger.info(
        "exported fused detector: %d bytes, platforms=%s", len(blob), exported.platforms
    )
    return blob


def load_detector(blob: bytes):
    """Deserialize an exported detector: detect(images01) or, for fused artifacts,
    detect(canvas_u8, sizes) -> Detections."""
    exported = jax_export.deserialize(blob)
    return lambda *args: exported.call(*args)
