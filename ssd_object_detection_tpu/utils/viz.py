"""Qualitative visualization: box drawing + prediction/target rendering.

Capability parity with reference utils/bbox.py:104-147 (`draw_bbox`) and the
model-level `visualize` / `visualize_dataset` / `visualize_prior_box` trio
(models/ssd_model.py:425-490), reworked to pure functions over numpy arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ssd_object_detection_tpu.ops import boxes as box_ops


def draw_bbox(
    image: np.ndarray,
    bboxes: Sequence,
    cls_labels: Sequence,
    cls_names: Sequence[str],
    cls_colors: Sequence,
    scores: Optional[Sequence] = None,
    show_names: bool = True,
) -> np.ndarray:
    """Draw cxcywh pixel boxes + labels on an RGB image ([0,1] float or uint8).

    Mirrors reference draw_bbox (utils/bbox.py:104-147): rectangle, filled name plate,
    label text, coordinates clipped to +-10000. Returns RGB uint8 (the reference
    returns BGR because it renders for cv2.imshow; TensorBoard wants RGB).
    """
    img = np.asarray(image)
    if img.dtype in (np.float32, np.float64):
        img = img * 255
    img = img.astype(np.uint8).copy()

    for i, (cat, (cx, cy, w, h)) in enumerate(zip(cls_labels, bboxes)):
        cx, cy, w, h = np.clip((cx, cy, w, h), -10000, 10000)
        pt1 = (int(cx - w / 2), int(cy - h / 2))
        pt2 = (int(cx + w / 2), int(cy + h / 2))
        color = tuple(int(c) for c in cls_colors[int(cat)])
        cv2.rectangle(img, pt1, pt2, color, 2)
        if show_names:
            label = cls_names[int(cat)]
            if scores is not None:
                label = f"{label} {float(scores[i]):.2f}"
            ts = cv2.getTextSize(label, cv2.FONT_HERSHEY_COMPLEX, 0.5, 1)[0]
            cv2.rectangle(img, (pt1[0] - 1, pt1[1] - ts[1] - 2), (pt1[0] + ts[0], pt1[1] - 1), color, -1)
            cv2.putText(img, label, (pt1[0], pt1[1] - 2), cv2.FONT_HERSHEY_COMPLEX, 0.5, (0, 0, 0), 1)
    return img


def render_targets(
    image01: np.ndarray,
    anchor_cls: np.ndarray,
    anchor_loc: np.ndarray,
    anchor_mask: np.ndarray,
    anchors: np.ndarray,
    cls_names: Sequence[str],
    cls_colors: Sequence,
    image_size: Optional[int] = None,
    scores: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode encoded per-anchor targets/preds at masked anchors and draw them
    (reference visualize_dataset, models/ssd_model.py:446-475)."""
    size = image_size or image01.shape[0]
    mask = np.asarray(anchor_mask).astype(bool)
    dec = np.asarray(box_ops.decode_boxes(anchor_loc[mask], anchors[mask], scale=size))
    return draw_bbox(
        image01,
        dec,
        np.asarray(anchor_cls)[mask],
        cls_names,
        cls_colors,
        scores=None if scores is None else np.asarray(scores)[mask],
    )


def render_predictions(
    image01: np.ndarray,
    pred_loc: np.ndarray,
    pred_logits: np.ndarray,
    anchors: np.ndarray,
    cls_names: Sequence[str],
    cls_colors: Sequence,
    thresh: float = 0.3,
) -> np.ndarray:
    """Score-threshold decode of raw outputs for logging panels (reference `visualize`,
    models/ssd_model.py:477-490: fg prob > thresh AND bg prob <= thresh, no NMS)."""
    logits = np.asarray(pred_logits, np.float64)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    fg_score = probs[:, :-1].max(-1)
    mask = (fg_score > thresh) & (probs[:, -1] <= thresh)
    cls = probs[:, :-1].argmax(-1)
    return render_targets(
        image01, cls, pred_loc, mask, anchors, cls_names, cls_colors, scores=fg_score
    )


def render_anchor_grid(anchors: np.ndarray, image_size: int = 300, max_cells: int = 6) -> np.ndarray:
    """Static montage of anchor shapes at a few cells (non-interactive replacement for
    reference visualize_prior_box, models/ssd_model.py:425-444, which loops cv2.imshow)."""
    panels = []
    seen_centers = []
    for cx, cy, w, h in anchors:
        if (cx, cy) not in seen_centers:
            seen_centers.append((cx, cy))
            panels.append(np.zeros((image_size, image_size, 3), np.uint8))
            if len(panels) > max_cells:
                break
        idx = seen_centers.index((cx, cy))
        if idx >= len(panels):
            continue
        pt1 = (int((cx - w / 2) * image_size), int((cy - h / 2) * image_size))
        pt2 = (int((cx + w / 2) * image_size), int((cy + h / 2) * image_size))
        cv2.rectangle(panels[idx], pt1, pt2, (255, 255, 255), 1)
    return np.concatenate(panels[:max_cells], axis=1)
