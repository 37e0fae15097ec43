"""COCO-style mAP evaluator (own implementation — pycocotools is not in this image).

Implements the COCOeval bbox protocol: greedy score-ordered matching per (image,
class, IoU threshold) with crowd-ignore handling, 101-point interpolated AP averaged
over IoU thresholds 0.50:0.95:0.05 and over classes, maxDets=100. The reference repo
has no evaluation at all (SURVEY.md section 2: "NMS, mAP/COCOeval evaluation ...
absent"); BASELINE.json's mAP-parity gate requires one.

Matching rules (mirroring pycocotools cocoeval.py semantics):
  - detections sorted by descending score; each claims the unclaimed GT with the
    highest IoU >= thresh;
  - a detection may fall back to a crowd/ignored GT (matching it marks the detection
    ignored — neither TP nor FP); crowd IoU uses intersection/det_area;
  - unmatched detections are FPs; non-ignored unmatched GTs are FNs;
  - AP: precision envelope (monotone from the right) sampled at 101 recall points,
    averaged over classes that have GTs.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)  # 0.50 ... 0.95
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_xyxy(dets: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """IoU matrix (n_det, n_gt); crowd GT columns use intersection/det_area."""
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    det_area = np.clip(dets[:, 2] - dets[:, 0], 0, None) * np.clip(dets[:, 3] - dets[:, 1], 0, None)
    gt_area = np.clip(gts[:, 2] - gts[:, 0], 0, None) * np.clip(gts[:, 3] - gts[:, 1], 0, None)
    union = det_area[:, None] + gt_area[None, :] - inter
    union = np.where(iscrowd[None, :].astype(bool), det_area[:, None], union)
    return inter / np.maximum(union, 1e-10)


@dataclasses.dataclass
class _ImageEval:
    """Per (image, class) match bookkeeping across all IoU thresholds."""

    det_scores: np.ndarray  # (n_det,)
    det_matched: np.ndarray  # (T, n_det) bool: matched to a non-ignored GT
    det_ignored: np.ndarray  # (T, n_det) bool: matched to an ignored/crowd GT
    num_gt: int  # non-ignored GTs


class DetectionEvaluator:
    """Accumulate per-image detections + ground truths, then compute mAP.

    Boxes are xyxy in any consistent unit (typically original-image pixels).
    """

    def __init__(self, num_classes: int = 80, max_dets: int = 100):
        self.num_classes = num_classes
        self.max_dets = max_dets
        self._per_class: Dict[int, List[_ImageEval]] = defaultdict(list)

    def add_image(
        self,
        det_boxes: np.ndarray,  # (N, 4) xyxy
        det_scores: np.ndarray,  # (N,)
        det_classes: np.ndarray,  # (N,) int
        gt_boxes: np.ndarray,  # (M, 4) xyxy
        gt_classes: np.ndarray,  # (M,) int
        gt_ignore: Optional[np.ndarray] = None,  # (M,) bool (e.g. iscrowd)
    ) -> None:
        if gt_ignore is None:
            gt_ignore = np.zeros((len(gt_boxes),), bool)
        gt_ignore = gt_ignore.astype(bool)

        order = np.argsort(-det_scores, kind="stable")[: self.max_dets]
        det_boxes, det_scores, det_classes = det_boxes[order], det_scores[order], det_classes[order]

        classes = set(np.unique(gt_classes).tolist()) | set(np.unique(det_classes).tolist())
        for c in classes:
            d_sel = det_classes == c
            g_sel = gt_classes == c
            d_boxes, d_scores = det_boxes[d_sel], det_scores[d_sel]
            g_boxes, g_ign = gt_boxes[g_sel], gt_ignore[g_sel]

            n_d, n_g = len(d_boxes), len(g_boxes)
            T = len(IOU_THRESHOLDS)
            matched = np.zeros((T, n_d), bool)
            ignored = np.zeros((T, n_d), bool)
            if n_d and n_g:
                iou = _iou_xyxy(d_boxes, g_boxes, g_ign)
                real = ~g_ign
                for ti, t in enumerate(IOU_THRESHOLDS):
                    thr = min(t, 1 - 1e-10)
                    gt_taken = np.zeros((n_g,), bool)
                    # greedy over score-sorted detections; the per-detection GT pick
                    # is vectorized: prefer the best AVAILABLE non-ignored GT with
                    # IoU >= thr, else fall back to the best ignored/crowd GT
                    # (pycocotools semantics; ties resolve to the lowest index here
                    # where pycocotools takes the highest — identical up to exact
                    # float ties)
                    for di in range(n_d):
                        row = iou[di]
                        cand = real & ~gt_taken & (row >= thr)
                        if cand.any():
                            best_g = int(np.argmax(np.where(cand, row, -1.0)))
                            gt_taken[best_g] = True
                            matched[ti, di] = True
                            continue
                        cand = g_ign & (row >= thr)  # crowd GTs absorb any number
                        if cand.any():
                            ignored[ti, di] = True
            self._per_class[int(c)].append(
                _ImageEval(
                    det_scores=d_scores,
                    det_matched=matched,
                    det_ignored=ignored,
                    num_gt=int((~g_ign).sum()),
                )
            )

    def _class_ap(self, evals: List[_ImageEval]) -> Optional[np.ndarray]:
        """(T,) AP per IoU threshold for one class, or None if the class has no GTs."""
        num_gt = sum(e.num_gt for e in evals)
        if num_gt == 0:
            return None
        scores = np.concatenate([e.det_scores for e in evals]) if evals else np.zeros((0,))
        T = len(IOU_THRESHOLDS)
        matched = (
            np.concatenate([e.det_matched for e in evals], axis=1)
            if evals else np.zeros((T, 0), bool)
        )
        ignored = (
            np.concatenate([e.det_ignored for e in evals], axis=1)
            if evals else np.zeros((T, 0), bool)
        )
        order = np.argsort(-scores, kind="mergesort")
        matched, ignored = matched[:, order], ignored[:, order]

        aps = np.zeros((T,))
        for ti in range(T):
            keep = ~ignored[ti]
            tp = np.cumsum(matched[ti][keep])
            fp = np.cumsum(~matched[ti][keep])
            if len(tp) == 0:
                aps[ti] = 0.0  # GTs exist but nothing was detected
                continue
            recall = tp / num_gt
            precision = tp / np.maximum(tp + fp, 1e-10)
            # precision envelope, then 101-point sampling
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            idx = np.searchsorted(recall, RECALL_POINTS, side="left")
            prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
            aps[ti] = prec_at.mean()
        return aps

    def summarize(self) -> Dict[str, float]:
        per_class: Dict[int, np.ndarray] = {}
        for c, evals in self._per_class.items():
            ap = self._class_ap(evals)
            if ap is not None:
                per_class[c] = ap
        if not per_class:
            return {"mAP": 0.0, "mAP@0.5": 0.0, "mAP@0.75": 0.0, "num_classes_evaluated": 0}
        stacked = np.stack(list(per_class.values()))  # (C, T)
        return {
            "mAP": float(stacked.mean()),
            "mAP@0.5": float(stacked[:, 0].mean()),
            "mAP@0.75": float(stacked[:, IOU_THRESHOLDS.tolist().index(0.75)].mean()),
            "num_classes_evaluated": len(per_class),
        }
