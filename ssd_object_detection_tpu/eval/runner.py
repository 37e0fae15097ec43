"""Evaluation runner: stream a dataset through the jitted predict fn into the mAP
evaluator. New capability — the reference has no evaluation entry point at all
(SURVEY.md section 3.3: "No NMS, no top-k, no batched decode API")."""

from __future__ import annotations

import logging
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from ssd_object_detection_tpu.eval.coco_map import DetectionEvaluator
from ssd_object_detection_tpu.ops import boxes as box_ops

logger = logging.getLogger(__name__)


def evaluate_batches(
    predict_fn,
    params,
    batches: Iterable[Dict[str, np.ndarray]],
    num_classes: int = 80,
    max_batches: Optional[int] = None,
    mesh=None,
) -> Dict[str, float]:
    """Run prediction over batches and compute COCO-style mAP.

    Batches carry relative-cxcywh GTs + `orig_size` (h, w); predictions and GTs are
    both scaled to original-pixel xyxy before matching, so the numbers are
    COCO-comparable.

    With `mesh` (a 1-D data mesh from parallel.make_mesh), inference itself is
    data-parallel: params are replicated once and each batch is sharded along axis
    0 — the SAME jitted predict runs, GSPMD partitions it, detections gather back
    identical to single-device (tests/test_parallel.py). Batches whose size does
    not divide the mesh (e.g. the epoch remainder) are PADDED with zero images up
    to the steady-state batch size when one has been seen (reusing the already
    compiled program) or the next mesh multiple otherwise, sharded, and the
    padding's detections sliced off — exact results, no N-times-redundant
    replicated compute on the tail batch. The reference has no multi-device
    anything (SURVEY.md section 2).
    """
    steady_batch = None  # first mesh-divisible batch size seen (compile reuse)
    if mesh is not None:
        from ssd_object_detection_tpu.parallel.mesh import replicate

        params = replicate(params, mesh)
    else:
        # Commit params to device ONCE. Weights loaded from msgpack are host
        # numpy arrays, and jit re-transfers numpy arguments on EVERY call —
        # at eval batch rate that re-ships the whole parameter tree per batch
        # (~1 s/batch over the tunnel). No-op for already-committed arrays.
        params = jax.device_put(params)
    evaluator = DetectionEvaluator(num_classes=num_classes)
    n = 0
    for batch in batches:
        images = batch["image"]
        true_b = images.shape[0]
        if mesh is not None:
            from ssd_object_detection_tpu.parallel.mesh import shard_batch

            if true_b % mesh.size != 0:
                if steady_batch is not None and steady_batch > true_b:
                    pad_to = steady_batch
                else:
                    pad_to = ((true_b + mesh.size - 1) // mesh.size) * mesh.size
                images = np.asarray(images)
                pad = np.zeros((pad_to - true_b,) + images.shape[1:], images.dtype)
                images = np.concatenate([images, pad], axis=0)
            elif steady_batch is None:
                steady_batch = true_b
            images = shard_batch(images, mesh)
        det = predict_fn(params, images)
        # One pytree fetch: device_get overlaps the four copies (one link round
        # trip), where four sequential np.asarray fetches pay four RTTs per
        # batch through the axon tunnel (same fix as DetectorService.detect_images).
        det_boxes, det_scores, det_classes, det_valid = jax.device_get(
            (det.boxes, det.scores, det.classes, det.valid)
        )
        det_boxes = det_boxes[:true_b]  # (B, K, 4) relative cxcywh
        det_scores = det_scores[:true_b]
        det_classes = det_classes[:true_b]
        det_valid = det_valid[:true_b]

        batch_size = true_b
        for b in range(batch_size):
            if "orig_size" in batch:
                h, w = (int(x) for x in batch["orig_size"][b])
            else:
                h = w = batch["image"].shape[1]
            scale = np.array([w, h, w, h], np.float32)

            keep = det_valid[b]
            d_xyxy = np.asarray(box_ops.cxcywh_to_xyxy(det_boxes[b][keep] * scale))
            g_valid = np.asarray(batch["gt_valid"][b]).astype(bool)
            g_xyxy = np.asarray(
                box_ops.cxcywh_to_xyxy(np.asarray(batch["gt_boxes"][b])[g_valid] * scale)
            )
            # crowd GTs are matchable-but-ignored (COCOeval semantics); pipelines
            # without the flag (synthetic) evaluate every GT as real
            g_crowd = (
                np.asarray(batch["gt_crowd"][b]).astype(bool)[g_valid]
                if "gt_crowd" in batch else None
            )
            evaluator.add_image(
                det_boxes=d_xyxy,
                det_scores=det_scores[b][keep],
                det_classes=det_classes[b][keep],
                gt_boxes=g_xyxy,
                gt_classes=np.asarray(batch["gt_cls"][b])[g_valid],
                gt_ignore=g_crowd,
            )
        n += 1
        if max_batches is not None and n >= max_batches:
            break
    metrics = evaluator.summarize()
    logger.info("evaluated %d batches: %s", n, metrics)
    return metrics
