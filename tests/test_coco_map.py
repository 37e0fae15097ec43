"""mAP evaluator unit tests with hand-computable scenarios."""

import numpy as np
import pytest

from ssd_object_detection_tpu.eval.coco_map import DetectionEvaluator


def _box(x, y, w, h):
    return [x, y, x + w, y + h]


def test_perfect_detections_map_one():
    ev = DetectionEvaluator(num_classes=3)
    gt = np.array([_box(0, 0, 10, 10), _box(20, 20, 10, 10)], float)
    cls = np.array([0, 1])
    ev.add_image(gt, np.array([0.9, 0.8]), cls, gt, cls)
    out = ev.summarize()
    assert out["mAP"] == pytest.approx(1.0)
    assert out["mAP@0.5"] == pytest.approx(1.0)


def test_miss_halves_recall():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10), _box(50, 50, 10, 10)], float)
    cls = np.array([0, 0])
    # only first GT detected
    ev.add_image(gt[:1], np.array([0.9]), cls[:1], gt, cls)
    out = ev.summarize()
    # precision 1 up to recall 0.5, then 0 -> 101-pt AP ~ 51/101
    assert out["mAP@0.5"] == pytest.approx(51 / 101, abs=0.01)


def test_false_positive_lowers_precision():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10)], float)
    dets = np.array([_box(0, 0, 10, 10), _box(80, 80, 5, 5)], float)
    # FP scored higher than the TP
    ev.add_image(dets, np.array([0.95, 0.9]), np.array([0, 0]), gt, np.array([0]))
    out = ev.summarize()
    # wait: the FP is the SECOND det here; order by score: box0 (0.95, TP), fp (0.9)
    # precision stays 1.0 at all recall points -> AP 1.0
    assert out["mAP@0.5"] == pytest.approx(1.0)

    ev2 = DetectionEvaluator()
    ev2.add_image(dets[::-1], np.array([0.95, 0.9]), np.array([0, 0]), gt, np.array([0]))
    # now the FP comes first: precision at recall>0 is 1/2
    assert ev2.summarize()["mAP@0.5"] == pytest.approx(0.5, abs=0.01)


def test_localization_quality_affects_high_iou_thresholds():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10)], float)
    det = np.array([_box(1, 0, 10, 10)], float)  # IoU = 9/11 ~ 0.818
    ev.add_image(det, np.array([0.9]), np.array([0]), gt, np.array([0]))
    out = ev.summarize()
    assert out["mAP@0.5"] == pytest.approx(1.0)
    assert out["mAP@0.75"] == pytest.approx(1.0)
    assert out["mAP"] < 1.0  # fails at IoU 0.85+


def test_crowd_gt_neither_tp_nor_fp():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10), _box(30, 30, 20, 20)], float)
    cls = np.array([0, 0])
    ignore = np.array([False, True])
    dets = np.array([_box(0, 0, 10, 10), _box(32, 32, 10, 10)], float)
    # second det lands inside the crowd region -> ignored, not FP
    ev.add_image(dets, np.array([0.9, 0.8]), np.array([0, 0]), gt, cls, gt_ignore=ignore)
    out = ev.summarize()
    assert out["mAP@0.5"] == pytest.approx(1.0)


def test_wrong_class_is_fp():
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10)], float)
    ev.add_image(gt, np.array([0.9]), np.array([1]), gt, np.array([0]))
    out = ev.summarize()
    assert out["mAP@0.5"] == pytest.approx(0.0)


def test_duplicate_detection_is_fp():
    """Second detection of an already-claimed GT counts as FP (greedy matching)."""
    ev = DetectionEvaluator()
    gt = np.array([_box(0, 0, 10, 10)], float)
    dets = np.array([_box(0, 0, 10, 10), _box(0, 0, 10, 10)], float)
    ev.add_image(dets, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0]))
    out = ev.summarize()
    # recall hits 1.0 with precision 1.0 first, duplicate adds FP after full recall
    assert out["mAP@0.5"] == pytest.approx(1.0)


def test_multi_image_accumulation():
    ev = DetectionEvaluator()
    gt1 = np.array([_box(0, 0, 10, 10)], float)
    gt2 = np.array([_box(5, 5, 10, 10)], float)
    ev.add_image(gt1, np.array([0.9]), np.array([0]), gt1, np.array([0]))
    ev.add_image(np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,), int), gt2, np.array([0]))
    out = ev.summarize()
    assert 0.4 < out["mAP@0.5"] < 0.6  # half the GTs found
