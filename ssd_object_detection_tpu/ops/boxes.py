"""Box geometry primitives (cxcywh-centric, matching the reference's conventions).

Replaces reference utils/bbox.py:6-101 (`iou`, `iou_n`, `apply_anchor_box`) and the
inline decoder at reference models/ssd_model.py:466-467 with pure-jnp, jit/vmap-friendly
functions. All functions are shape-polymorphic over leading batch dims and run entirely
on device.

Conventions:
  - "cxcywh": [center_x, center_y, width, height]; may be absolute pixels or relative.
  - "xyxy":   [x_min, y_min, x_max, y_max].
  - `legacy_clamp=True` reproduces the reference's IoU quirks bit-for-bit in float32:
    intersection side lengths clamped to a 1e-10 floor instead of 0 (so fully disjoint
    boxes get a tiny positive IoU), and a +1e-10 union-denominator guard
    (reference utils/bbox.py:39,41). Use the default (False) everywhere except the
    reference-parity matcher.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-10


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] cxcywh -> xyxy."""
    cxy = boxes[..., :2]
    half = boxes[..., 2:] * 0.5
    return jnp.concatenate([cxy - half, cxy + half], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] xyxy -> cxcywh."""
    wh = boxes[..., 2:] - boxes[..., :2]
    cxy = (boxes[..., :2] + boxes[..., 2:]) * 0.5
    return jnp.concatenate([cxy, wh], axis=-1)


def xywh_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """COCO [x_min, y_min, w, h] -> cxcywh (reference coco/make_dataset.py:132)."""
    cxy = boxes[..., :2] + boxes[..., 2:] * 0.5
    return jnp.concatenate([cxy, boxes[..., 2:]], axis=-1)


def iou_pair(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray, legacy_clamp: bool = False) -> jnp.ndarray:
    """Elementwise IoU of two broadcast-compatible [..., 4] cxcywh arrays.

    Covers the reference's `iou` (scalar pair, utils/bbox.py:6-25, clamps intersection
    at 0) and `iou_n` (row-wise, utils/bbox.py:28-41, clamps each side length at 1e-10).
    """
    min_a = boxes_a[..., :2] - boxes_a[..., 2:] * 0.5
    max_a = boxes_a[..., :2] + boxes_a[..., 2:] * 0.5
    min_b = boxes_b[..., :2] - boxes_b[..., 2:] * 0.5
    max_b = boxes_b[..., :2] + boxes_b[..., 2:] * 0.5

    side = jnp.minimum(max_a, max_b) - jnp.maximum(min_a, min_b)
    floor = _EPS if legacy_clamp else 0.0
    side = jnp.maximum(side, floor)
    inter = side[..., 0] * side[..., 1]

    area_a = boxes_a[..., 2] * boxes_a[..., 3]
    area_b = boxes_b[..., 2] * boxes_b[..., 3]
    return inter / (area_a + area_b - inter + _EPS)


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray, legacy_clamp: bool = False) -> jnp.ndarray:
    """Full [N, M] IoU matrix of cxcywh boxes [N, 4] x [M, 4].

    The reference materializes this matrix on the host by `np.repeat`-tiling both inputs
    to N*M rows (utils/bbox.py:53-58); here it is a single broadcast on device.
    """
    return iou_pair(boxes_a[..., :, None, :], boxes_b[..., None, :, :], legacy_clamp=legacy_clamp)


def encode_boxes(gt_boxes: jnp.ndarray, anchors: jnp.ndarray, variances=None) -> jnp.ndarray:
    """SSD offset encoding of cxcywh gt boxes against cxcywh anchors.

    Reference `apply_anchor_box` (utils/bbox.py:94-101): xy = (gt_xy - a_xy) / a_wh,
    wh = log(max(gt_wh, 1e-5) / max(a_wh, 1e-5)). The reference uses NO variance
    scaling; pass `variances=(0.1, 0.2)` for the canonical-SSD variant.
    """
    xy = (gt_boxes[..., :2] - anchors[..., :2]) / anchors[..., 2:]
    wh = jnp.log(jnp.maximum(gt_boxes[..., 2:], 1e-5) / jnp.maximum(anchors[..., 2:], 1e-5))
    if variances is not None:
        xy = xy / variances[0]
        wh = wh / variances[1]
    return jnp.concatenate([xy, wh], axis=-1)


def decode_boxes(pred: jnp.ndarray, anchors: jnp.ndarray, variances=None, scale: float = 1.0) -> jnp.ndarray:
    """Inverse of `encode_boxes` -> cxcywh boxes (optionally scaled to pixels).

    Reference inline decode (models/ssd_model.py:466-467): xy = (p_xy*a_wh + a_xy)*300,
    wh = exp(p_wh)*a_wh*300; `scale` generalizes the x300.
    """
    if variances is not None:
        pred = jnp.concatenate([pred[..., :2] * variances[0], pred[..., 2:] * variances[1]], axis=-1)
    xy = (pred[..., :2] * anchors[..., 2:] + anchors[..., :2]) * scale
    wh = jnp.exp(pred[..., 2:]) * anchors[..., 2:] * scale
    return jnp.concatenate([xy, wh], axis=-1)
