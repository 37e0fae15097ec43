"""Batched, class-aware NMS with fully static shapes (TPU-friendly).

The reference has NO NMS anywhere (SURVEY.md component 16: its only decode path is a
score-threshold visualization, models/ssd_model.py:477-490). BASELINE.json's north star
requires a batched per-class NMS decode running entirely on TPU, so this is a new
capability designed for XLA:

  - no dynamic output shapes: every stage uses fixed top-k sizes with score padding;
  - per-class suppression is a vmap over classes of an O(K^2) pairwise-IoU greedy sweep
    expressed as a `lax.scan` over the K score-sorted candidates (K ~ 100-400, so the
    KxK matrix is tiny and the scan is the classic TPU NMS formulation);
  - the per-class results merge via one global top-k over C*K candidates.

Suppression math: candidate j survives iff no higher-scoring surviving candidate i has
IoU(i, j) > iou_thresh. The scan walks candidates in descending-score order, keeping a
running "suppressed" mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssd_object_detection_tpu.ops import boxes as box_ops


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (..., max_detections, 4) cxcywh, same units as input boxes
    scores: jnp.ndarray  # (..., max_detections) float32; padding entries are 0
    classes: jnp.ndarray  # (..., max_detections) int32; padding entries are -1
    valid: jnp.ndarray  # (..., max_detections) bool


def _suppress(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float) -> jnp.ndarray:
    """Greedy NMS keep-mask for score-DESC-sorted candidates (K, 4)/(K,). Returns (K,) bool.

    Exact greedy NMS computed as a fixpoint instead of a K-step sequential scan:
    the greedy keep-set S is the unique solution of

        alive[j]  <=>  no i < j with alive[i] and IoU(i, j) > thresh.

    Iterating alive' = ~(alive @ tri_overlap) from alive=all-ones converges to S in at
    most `longest suppression chain` steps (typically 2-4); each step is one (K, K)
    matmul that lands on the MXU, vs K sequential latency-bound steps for a scan.
    Iterations are capped at 16 (as TF's combined_non_max_suppression caps its
    identical self-suppression loop): beyond-cap chains can only arise from 16+ boxes
    each suppressing the next at IoU>thresh — degenerate for peaked detector scores.
    """
    num = scores.shape[0]
    wh_i = jnp.maximum(boxes_xyxy[:, 2:] - boxes_xyxy[:, :2], 0.0)
    area = wh_i[:, 0] * wh_i[:, 1]
    lt = jnp.maximum(boxes_xyxy[:, None, :2], boxes_xyxy[None, :, :2])
    rb = jnp.minimum(boxes_xyxy[:, None, 2:], boxes_xyxy[None, :, 2:])
    inter_wh = jnp.maximum(rb - lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-10)

    row = jax.lax.broadcasted_iota(jnp.int32, (num, num), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (num, num), 1)
    # tri[i, j]: higher-scoring i would suppress j
    tri = ((iou > iou_thresh) & (row < col)).astype(jnp.float32)

    max_iters = min(num, 16)

    def cond(state):
        alive, prev, it = state
        return (it < max_iters) & jnp.any(alive != prev)

    def body(state):
        alive, _, it = state
        suppressed = jnp.dot(alive.astype(jnp.float32), tri, preferred_element_type=jnp.float32) > 0.5
        return (~suppressed, alive, it + 1)

    init = jnp.ones((num,), bool)
    alive, _, _ = jax.lax.while_loop(cond, body, (init, jnp.zeros((num,), bool), jnp.int32(0)))
    return alive


@partial(
    jax.jit,
    static_argnames=("iou_thresh", "score_thresh", "top_k_per_class", "max_detections"),
)
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float = 0.45,
    score_thresh: float = 0.01,
    top_k_per_class: int = 200,
    max_detections: int = 100,
) -> Detections:
    """Class-aware NMS over SSD outputs.

    Args:
      boxes: (B, D, 4) decoded cxcywh boxes (class-agnostic, as SSD predicts).
      scores: (B, D, C) per-class foreground probabilities (background channel already
        stripped by the caller; see eval/predict.py).
    Returns `Detections` with static shape (B, max_detections, ...).
    """
    num_classes = scores.shape[-1]
    num_boxes = boxes.shape[-2]
    top_k_per_class = min(top_k_per_class, num_boxes)
    merge_pool = num_classes * top_k_per_class
    max_detections = min(max_detections, merge_pool)

    def per_image(img_boxes, img_scores):  # (D, 4), (D, C)
        boxes_xyxy = box_ops.cxcywh_to_xyxy(img_boxes)

        def per_class(cls_scores):  # (D,)
            cls_scores = jnp.where(cls_scores >= score_thresh, cls_scores, 0.0)
            top_scores, top_idx = jax.lax.top_k(cls_scores, top_k_per_class)
            top_boxes = boxes_xyxy[top_idx]
            keep = _suppress(top_boxes, top_scores, iou_thresh) & (top_scores > 0.0)
            return jnp.where(keep, top_scores, 0.0), top_idx

        cls_scores_kept, cls_idx = jax.vmap(per_class)(img_scores.T)  # (C, K), (C, K)
        flat_scores = cls_scores_kept.reshape(-1)
        flat_anchor = cls_idx.reshape(-1)
        flat_class = (
            jnp.arange(num_classes, dtype=jnp.int32)[:, None]
            .repeat(top_k_per_class, axis=1)
            .reshape(-1)
        )

        final_scores, final_pos = jax.lax.top_k(flat_scores, max_detections)
        valid = final_scores > 0.0
        final_boxes = img_boxes[flat_anchor[final_pos]]
        final_class = jnp.where(valid, flat_class[final_pos], -1)
        return Detections(
            boxes=jnp.where(valid[:, None], final_boxes, 0.0),
            scores=final_scores,
            classes=final_class,
            valid=valid,
        )

    return jax.vmap(per_image)(boxes, scores)
