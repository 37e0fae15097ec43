"""Batched inference: forward -> candidate pool -> softmax/decode on pool -> NMS.

The reference has NO inference entry point — its only decode is a host-side
visualization with a bare score threshold (reference models/ssd_model.py:477-490).
This is the first-class batched predict API required by BASELINE.json (configs #1/#2).

TPU-first structure (v5e-measured): materializing softmax probabilities and decoded
boxes for all D=8732 anchors costs ~10 ms at batch 32 (the 81-class axis pads to 128
lanes). Instead the class-agnostic candidate ranking happens in LOGIT space —
max_c p_c = exp(max_fg_logit - logsumexp) is monotone in (max_fg_logit - logsumexp),
two cheap (B, D) passes — and softmax, box decode, and NMS then run only on the
pre_nms_top_k pooled candidates (400 instead of 8732). With nms_mode="per_class" the
result is bitwise-equal to running ops/nms.batched_nms on fully-materialized scores
(same pool, same stages) — verified by tests/test_fused_predict.py. The DEFAULT
nms_mode="merged" trades that exactness for speed: it examines only the global
top-M (anchor, class) pairs (see ops/nms.nms_on_pool_merged for when results can
differ).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ssd_object_detection_tpu.ops import boxes as box_ops
from ssd_object_detection_tpu.ops.nms import Detections, nms_on_pool, nms_on_pool_merged


def detect_from_logits(
    pred_loc: jnp.ndarray,  # (B, D, 4)
    pred_logits: jnp.ndarray,  # (B, D, C) raw, background LAST
    anchors: jnp.ndarray,  # (D, 4)
    variances: Optional[Tuple[float, float]] = None,
    iou_thresh: float = 0.45,
    score_thresh: float = 0.01,
    pre_nms_top_k: int = 400,
    top_k_per_class: int = 100,
    max_detections: int = 100,
    # "merged" (fast, torchvision-style) | "merged_top2" (merged with per-anchor
    # top-2 class candidates — cheapest; see ops/nms.nms_on_pool_merged) | "per_class"
    nms_mode: str = "merged",
    merged_top_k: Optional[int] = None,  # merged mode's global pool; None = auto
) -> Detections:
    """Fused decode: logits -> Detections, heavy work restricted to the candidate pool.

    `top_k_per_class` applies to nms_mode="per_class"; `merged_top_k` (None = a
    2.56x max_detections margin) applies to nms_mode="merged"."""
    if nms_mode not in ("per_class", "merged", "merged_top2"):
        # free-form strings reach here from 4 CLI tools + 2 export entry points;
        # a typo must not silently select the (17x heavier) per-class path
        raise ValueError(f"unknown nms_mode {nms_mode!r}: "
                         "expected 'per_class', 'merged' or 'merged_top2'")
    batch, num_anchors, num_ch = pred_logits.shape

    # Stage 1 in logit space: rank anchors by max foreground probability.
    # When the model keeps the logits bf16 (SSD conf_f32=False) all three passes
    # over the (B, D, C) tensor read it at HALF the HBM traffic, yet the ranking
    # key is bit-identical to the f32-output model:
    #   - both max reductions are pure comparisons (exact in any dtype; casting
    #     the reduced scalar afterwards equals reducing over casts),
    #   - the logsumexp shift/exp/sum arithmetic runs in f32 via a cast INSIDE the
    #     fused exp-sum pass (one consumer -> XLA fuses it; `logsumexp(x.astype(f32))`
    #     instead measured a materialized 143 MB f32 copy of the tensor, because the
    #     cast gets CSE'd once it feeds 2+ reduce consumers).
    amax = jnp.max(pred_logits, axis=-1)  # (B, D), exact in bf16
    shifted = pred_logits.astype(jnp.float32) - amax.astype(jnp.float32)[..., None]
    lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1)) + amax.astype(jnp.float32)
    fg_max = jnp.max(pred_logits[..., :-1], axis=-1).astype(jnp.float32)  # (B, D)
    n_pool = min(pre_nms_top_k, num_anchors)
    _, pool_idx = jax.lax.top_k(fg_max - lse, n_pool)  # (B, N)

    # Pooled softmax + decode (N anchors only; the gather reads the logits in their
    # stored dtype, softmax runs f32 on the small pooled tensor).
    pool_logits = jnp.take_along_axis(
        pred_logits, pool_idx[..., None], axis=1
    ).astype(jnp.float32)  # (B, N, C)
    pool_probs = jax.nn.softmax(pool_logits, axis=-1)[..., :-1]  # strip background
    pool_probs = jnp.where(pool_probs >= score_thresh, pool_probs, 0.0)
    pool_loc = jnp.take_along_axis(pred_loc, pool_idx[..., None], axis=1)
    pool_anchors = anchors[pool_idx]  # (B, N, 4)
    pool_boxes = box_ops.decode_boxes(pool_loc, pool_anchors, variances=variances)

    # Stages 2-4: shared pooled-candidate core (ops/nms.py).
    if nms_mode in ("merged", "merged_top2"):
        return nms_on_pool_merged(
            pool_boxes, pool_probs,
            iou_thresh=iou_thresh, merged_top_k=merged_top_k,
            max_detections=max_detections,
            per_anchor_top2=(nms_mode == "merged_top2"),
        )
    return nms_on_pool(
        pool_boxes, pool_probs,
        iou_thresh=iou_thresh, top_k_per_class=top_k_per_class,
        max_detections=max_detections,
    )


def make_predict_fn(
    apply_fn: Callable,
    anchors,
    variances: Optional[Tuple[float, float]] = None,
    iou_thresh: float = 0.45,
    score_thresh: float = 0.01,
    pre_nms_top_k: int = 400,
    top_k_per_class: int = 100,
    max_detections: int = 100,
    nms_mode: str = "merged",
    merged_top_k: Optional[int] = None,
) -> Callable:
    """Returns predict(params, images01) -> Detections (boxes relative cxcywh).

    `images01` are float32 in [0,1]; normalization to [-1,1] happens inside the jit
    (XLA fuses it into conv1's input handling — measured: an explicit weight-fold
    gains nothing and is WRONG at SAME-padding borders, where padded zeros mean
    -1 in normalized space).
    """
    anchors = jnp.asarray(anchors)

    @jax.jit
    def predict(params, images01) -> Detections:
        if images01.dtype == jnp.uint8:  # device-side scaling, 4x less H2D
            images01 = images01.astype(jnp.float32) / 255.0
        pred_loc, pred_logits = apply_fn(params, (images01 - 0.5) * 2.0)
        return detect_from_logits(
            pred_loc, pred_logits, anchors,
            variances=variances, iou_thresh=iou_thresh, score_thresh=score_thresh,
            pre_nms_top_k=pre_nms_top_k, top_k_per_class=top_k_per_class,
            max_detections=max_detections, nms_mode=nms_mode,
            merged_top_k=merged_top_k,
        )

    return predict


def make_fused_predict_fn(
    apply_fn: Callable,
    anchors,
    image_size: int = 300,
    variances: Optional[Tuple[float, float]] = None,
    iou_thresh: float = 0.45,
    score_thresh: float = 0.01,
    pre_nms_top_k: int = 400,
    top_k_per_class: int = 100,
    max_detections: int = 100,
    nms_mode: str = "merged",
    merged_top_k: Optional[int] = None,
    resize_method: str = "matmul",
) -> Callable:
    """Fully fused inference (BASELINE.json config #2): the host does only JPEG
    decode; resize, normalization, forward, softmax, decode, and NMS are ONE jit.

    Returns predict(params, canvas_u8, sizes) -> Detections, where `canvas_u8` is a
    planar (B, 3, Hc, Wc) uint8 canvas and `sizes` the per-image (h, w) valid extents
    (build both with ops/preprocess.pack_canvas). Replaces the reference's host
    cv2.resize + /255 + (x-0.5)*2 chain (data_loaders/ssd/make_dataset.py:37-46,
    models/ssd_model.py:214) with on-device ops (ops/preprocess.py).

    `resize_method`: "matmul" (default; MXU, ~3x faster, bf16 weight rounding
    bounded by ~1.5/255 per pixel) or "gather" (exact f32 arithmetic) — see
    ops/preprocess.resize_bilinear_planar. Callers needing bit-stable exports can
    opt into "gather" without editing library code.
    """
    from ssd_object_detection_tpu.ops.preprocess import normalize01, resize_bilinear_planar

    anchors = jnp.asarray(anchors)

    @jax.jit
    def predict(params, canvas_u8, sizes) -> Detections:
        images01 = resize_bilinear_planar(canvas_u8, sizes, image_size, method=resize_method)
        pred_loc, pred_logits = apply_fn(params, normalize01(images01))
        return detect_from_logits(
            pred_loc, pred_logits, anchors,
            variances=variances, iou_thresh=iou_thresh, score_thresh=score_thresh,
            pre_nms_top_k=pre_nms_top_k, top_k_per_class=top_k_per_class,
            max_detections=max_detections, nms_mode=nms_mode,
            merged_top_k=merged_top_k,
        )

    return predict
