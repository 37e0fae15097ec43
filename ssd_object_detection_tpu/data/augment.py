"""SSD-style data augmentation (host-side, box-aware, deterministic per seed).

The reference has NO augmentation (SURVEY.md components 7/8) — the SSD paper's
expand + min-IoU crop + flip recipe is the single largest mAP lever for this detector
family (the paper credits it with most of the VOC gain), so it is available here as an
opt-in upgrade (`data.augment`), default-off for reference parity.

Ops operate on (image float32 [0,1] RGB HxWx3, boxes relative cxcywh, labels) and run
before the resize in data/pipeline.py. Randomness comes from a caller-provided
numpy Generator so the pipeline stays deterministic per (seed, epoch, image).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

Sample = Tuple[np.ndarray, np.ndarray, np.ndarray]  # image, boxes cxcywh rel, labels

# SSD-paper crop options: minimum IoU with some GT, or None = keep whole image
CROP_MIN_IOUS = (None, 0.1, 0.3, 0.5, 0.7, 0.9)


def random_expand(image: np.ndarray, boxes: np.ndarray, rng: np.random.Generator,
                  max_ratio: float = 4.0, p: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """Zoom out: place the image on a mean-color canvas up to max_ratio^2 larger."""
    if rng.uniform() >= p:
        return image, boxes
    h, w = image.shape[:2]
    ratio = rng.uniform(1.0, max_ratio)
    new_h, new_w = int(h * ratio), int(w * ratio)
    top = int(rng.uniform(0, new_h - h))
    left = int(rng.uniform(0, new_w - w))
    canvas = np.full((new_h, new_w, 3), image.mean(axis=(0, 1)), dtype=image.dtype)
    canvas[top:top + h, left:left + w] = image
    out = boxes.copy()
    out[:, 0] = (out[:, 0] * w + left) / new_w
    out[:, 1] = (out[:, 1] * h + top) / new_h
    out[:, 2] = out[:, 2] * w / new_w
    out[:, 3] = out[:, 3] * h / new_h
    return canvas, out


def _iou_with_rect(boxes_xyxy: np.ndarray, rect: np.ndarray) -> np.ndarray:
    lt = np.maximum(boxes_xyxy[:, :2], rect[:2])
    rb = np.minimum(boxes_xyxy[:, 2:], rect[2:])
    inter = np.clip(rb - lt, 0, None).prod(axis=1)
    area_b = np.clip(boxes_xyxy[:, 2:] - boxes_xyxy[:, :2], 0, None).prod(axis=1)
    area_r = np.clip(rect[2:] - rect[:2], 0, None).prod()
    return inter / np.maximum(area_b + area_r - inter, 1e-10)


def random_min_iou_crop(
    image: np.ndarray, boxes: np.ndarray, labels: np.ndarray, rng: np.random.Generator,
    max_attempts: int = 50,
) -> Optional[Sample]:
    """SSD-paper sampled patch: pick a min-IoU constraint, sample a crop [0.3,1]x
    scale with aspect in [1/2, 2] overlapping at least one GT at >= that IoU; keep GTs
    whose CENTER is inside the crop (boxes clipped to the patch). Returns None when
    the no-constraint option is sampled or no valid crop is found (caller keeps the
    original)."""
    min_iou = CROP_MIN_IOUS[rng.integers(0, len(CROP_MIN_IOUS))]
    if min_iou is None:
        return None
    h, w = image.shape[:2]
    xyxy = np.stack([
        boxes[:, 0] - boxes[:, 2] / 2, boxes[:, 1] - boxes[:, 3] / 2,
        boxes[:, 0] + boxes[:, 2] / 2, boxes[:, 1] + boxes[:, 3] / 2,
    ], axis=1)
    for _ in range(max_attempts):
        cw = rng.uniform(0.3, 1.0)
        ch = rng.uniform(0.3, 1.0)
        if not (0.5 <= cw / ch <= 2.0):
            continue
        cx0 = rng.uniform(0, 1 - cw)
        cy0 = rng.uniform(0, 1 - ch)
        rect = np.array([cx0, cy0, cx0 + cw, cy0 + ch])
        ious = _iou_with_rect(xyxy, rect)
        # at least ONE GT must overlap the patch at >= min_iou (caffe-SSD semantics)
        if ious.max() < min_iou:
            continue
        centers_in = (
            (boxes[:, 0] > rect[0]) & (boxes[:, 0] < rect[2])
            & (boxes[:, 1] > rect[1]) & (boxes[:, 1] < rect[3])
        )
        if not centers_in.any():
            continue
        # crop pixels
        x0, y0 = int(rect[0] * w), int(rect[1] * h)
        x1, y1 = int(rect[2] * w), int(rect[3] * h)
        patch = image[y0:y1, x0:x1]
        # clip kept boxes to the crop, re-normalize
        kept = xyxy[centers_in]
        kept[:, 0::2] = np.clip(kept[:, 0::2], rect[0], rect[2])
        kept[:, 1::2] = np.clip(kept[:, 1::2], rect[1], rect[3])
        kept[:, 0::2] = (kept[:, 0::2] - rect[0]) / cw
        kept[:, 1::2] = (kept[:, 1::2] - rect[1]) / ch
        out = np.stack([
            (kept[:, 0] + kept[:, 2]) / 2, (kept[:, 1] + kept[:, 3]) / 2,
            kept[:, 2] - kept[:, 0], kept[:, 3] - kept[:, 1],
        ], axis=1).astype(np.float32)
        return patch, out, labels[centers_in]
    return None


def photometric_distort(image: np.ndarray, rng: np.random.Generator, p: float = 0.5) -> np.ndarray:
    """Brightness/contrast/saturation jitter (cheap approximation in RGB space)."""
    img = image
    if rng.uniform() < p:
        img = np.clip(img + rng.uniform(-0.12, 0.12), 0.0, 1.0)
    if rng.uniform() < p:
        img = np.clip((img - 0.5) * rng.uniform(0.7, 1.3) + 0.5, 0.0, 1.0)
    if rng.uniform() < p:
        gray = img.mean(axis=2, keepdims=True)
        img = np.clip(gray + (img - gray) * rng.uniform(0.7, 1.3), 0.0, 1.0)
    return img.astype(np.float32)


def ssd_augment(image: np.ndarray, boxes: np.ndarray, labels: np.ndarray,
                rng: np.random.Generator, expand: bool = True, crop: bool = True,
                photometric: bool = True) -> Sample:
    """Full SSD recipe (minus flip, which data/pipeline.py applies after resize)."""
    if photometric:
        image = photometric_distort(image, rng)
    if expand:
        image, boxes = random_expand(image, boxes, rng)
    if crop:
        cropped = random_min_iou_crop(image, boxes, labels, rng)
        if cropped is not None:
            image, boxes, labels = cropped
    return image, boxes, labels
