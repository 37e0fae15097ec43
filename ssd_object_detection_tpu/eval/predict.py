"""Batched inference: forward -> softmax -> decode -> class-aware NMS, one jit.

The reference has NO inference entry point — its only decode is a host-side
visualization with a bare score threshold (reference models/ssd_model.py:477-490).
This is the first-class batched predict API required by BASELINE.json (configs #1/#2).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ssd_object_detection_tpu.ops import boxes as box_ops
from ssd_object_detection_tpu.ops.nms import Detections, batched_nms


def make_predict_fn(
    apply_fn: Callable,
    anchors,
    variances: Optional[Tuple[float, float]] = None,
    iou_thresh: float = 0.45,
    score_thresh: float = 0.01,
    top_k_per_class: int = 200,
    max_detections: int = 100,
) -> Callable:
    """Returns predict(params, images01) -> Detections (boxes relative cxcywh).

    `images01` are float32 in [0,1]; normalization to [-1,1] happens inside the jit
    (fused with the first conv by XLA), matching the training path.
    """
    anchors = jnp.asarray(anchors)

    @jax.jit
    def predict(params, images01) -> Detections:
        pred_loc, pred_logits = apply_fn(params, (images01 - 0.5) * 2.0)
        probs = jax.nn.softmax(pred_logits, axis=-1)
        fg_scores = probs[..., :-1]  # background is the LAST channel; strip it
        boxes = box_ops.decode_boxes(pred_loc, anchors[None], variances=variances)
        return batched_nms(
            boxes,
            fg_scores,
            iou_thresh=iou_thresh,
            score_thresh=score_thresh,
            top_k_per_class=top_k_per_class,
            max_detections=max_detections,
        )

    return predict
