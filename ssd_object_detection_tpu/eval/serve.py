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


class DetectorService:
    """Request-oriented wrapper over the fused predict path: raw RGB images in,
    JSON-ready detection dicts out (pixel-space boxes in the ORIGINAL image frame).

    The production serving front door (tools/serve.py exposes it over HTTP). One
    fused XLA program is compiled at a fixed (batch_size, canvas) and reused for
    every request: images land on a shared uint8 canvas (ops/preprocess.pack_canvas),
    short request batches are padded with zero images and the padding's detections
    sliced off. Host work per request is JPEG decode + canvas packing only — the
    resize/normalize/forward/decode/NMS all run as the one jitted program that
    bench.py measures (BASELINE config #2).

    Oversized inputs (larger than the canvas — COCO's max side is 640, the default)
    are aspect-preserving host-downscaled to fit; box coordinates are computed in
    the original frame either way because the model's boxes are relative.

    New capability: the reference has no inference or serving entry point at all
    (SURVEY.md section 3.3 — its only decode is an interactive cv2 visualization,
    reference models/ssd_model.py:477-490).
    """

    def __init__(
        self,
        apply_fn,
        params,
        anchors,
        image_size: int,
        batch_size: int = 1,
        canvas_hw: Tuple[int, int] = (640, 640),
        variances: Optional[Tuple[float, float]] = None,
        score_thresh: float = 0.3,
        iou_thresh: float = 0.45,
        label_names: Optional[list] = None,
        **nms_kwargs,
    ):
        from ssd_object_detection_tpu.eval.predict import make_fused_predict_fn

        self._params = params
        self._batch_size = int(batch_size)
        self._canvas_hw = canvas_hw
        self._label_names = label_names
        self._predict = make_fused_predict_fn(
            apply_fn,
            anchors,
            image_size=image_size,
            variances=variances,
            score_thresh=score_thresh,
            iou_thresh=iou_thresh,
            **nms_kwargs,
        )

    def _fit_canvas(self, img):
        """Aspect-preserving host downscale of images exceeding the canvas."""
        hc, wc = self._canvas_hw
        h, w = img.shape[:2]
        if h <= hc and w <= wc:
            return img
        import cv2

        scale = min(hc / h, wc / w)
        return cv2.resize(
            img, (max(1, int(w * scale)), max(1, int(h * scale))),
            interpolation=cv2.INTER_AREA,
        )

    def detect_images(self, images):
        """list of HWC uint8 RGB arrays (len <= batch_size) -> per-image lists of
        {"box_xyxy": [x1,y1,x2,y2] float pixels, "score": float, "class_id": int
        [, "class_name": str]} sorted by descending score."""
        import numpy as np

        from ssd_object_detection_tpu.ops.preprocess import pack_canvas

        if not images:
            return []
        if len(images) > self._batch_size:
            raise ValueError(
                f"{len(images)} images exceed the compiled batch size "
                f"{self._batch_size}; split the request"
            )
        orig_hw = [img.shape[:2] for img in images]
        fitted = [self._fit_canvas(img) for img in images]
        pad = self._batch_size - len(fitted)
        fitted += [np.zeros((8, 8, 3), np.uint8)] * pad
        canvas, sizes = pack_canvas(fitted, self._canvas_hw)
        det = self._predict(self._params, jnp.asarray(canvas), jnp.asarray(sizes))

        results = []
        boxes = jax.device_get(det.boxes)  # (B, K, 4) relative cxcywh
        scores = jax.device_get(det.scores)
        classes = jax.device_get(det.classes)
        valid = jax.device_get(det.valid)
        for i, (h, w) in enumerate(orig_hw):
            keep = valid[i]
            cx, cy, bw, bh = (boxes[i, keep, j] for j in range(4))
            x1 = np.clip((cx - bw / 2) * w, 0, w)
            y1 = np.clip((cy - bh / 2) * h, 0, h)
            x2 = np.clip((cx + bw / 2) * w, 0, w)
            y2 = np.clip((cy + bh / 2) * h, 0, h)
            dets = []
            for k in range(int(keep.sum())):
                d = {
                    "box_xyxy": [float(x1[k]), float(y1[k]), float(x2[k]), float(y2[k])],
                    "score": float(scores[i, keep][k]),
                    "class_id": int(classes[i, keep][k]),
                }
                if self._label_names:
                    d["class_name"] = self._label_names[d["class_id"]]
                dets.append(d)
            dets.sort(key=lambda d: -d["score"])
            results.append(dets)
        return results

    def detect_encoded(self, data: bytes):
        """One JPEG/PNG request body -> detection list (see detect_images)."""
        import cv2
        import numpy as np

        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("could not decode image bytes")
        return self.detect_images([img[..., ::-1]])[0]  # BGR -> RGB
