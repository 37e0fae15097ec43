"""NMS tests (new capability — the reference has no NMS, SURVEY.md component 16)."""

import numpy as np

from ssd_object_detection_tpu.ops import boxes as box_ops
from ssd_object_detection_tpu.ops.nms import batched_nms


def _dets(boxes_cxcywh, class_scores):
    boxes = np.asarray(boxes_cxcywh, np.float32)[None]
    scores = np.asarray(class_scores, np.float32)[None]
    return batched_nms(boxes, scores, iou_thresh=0.5, score_thresh=0.05, top_k_per_class=8, max_detections=8)


def test_suppresses_overlapping_keeps_best():
    boxes = [[0.5, 0.5, 0.2, 0.2], [0.51, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1]]
    scores = [[0.9], [0.8], [0.7]]  # one class
    det = _dets(boxes, scores)
    valid = np.asarray(det.valid[0])
    assert valid.sum() == 2
    np.testing.assert_allclose(np.asarray(det.scores[0])[:2], [0.9, 0.7], atol=1e-6)
    np.testing.assert_allclose(np.asarray(det.boxes[0])[0], boxes[0], atol=1e-6)


def test_classes_do_not_suppress_each_other():
    boxes = [[0.5, 0.5, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]]
    scores = [[0.9, 0.0], [0.0, 0.8]]  # identical boxes, different classes
    det = _dets(boxes, scores)
    assert np.asarray(det.valid[0]).sum() == 2
    kept_classes = sorted(np.asarray(det.classes[0])[np.asarray(det.valid[0])].tolist())
    assert kept_classes == [0, 1]


def test_score_threshold_filters():
    boxes = [[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1]]
    scores = [[0.9], [0.01]]
    det = _dets(boxes, scores)
    assert np.asarray(det.valid[0]).sum() == 1


def test_chain_suppression_revives_third_box():
    """B overlaps A and C; A and C don't overlap. Greedy NMS keeps A and C."""
    a = [0.30, 0.5, 0.20, 0.2]
    b = [0.35, 0.5, 0.20, 0.2]
    c = [0.40, 0.5, 0.20, 0.2]
    iou_ab = float(box_ops.iou_pair(np.float32(a), np.float32(b)))
    iou_ac = float(box_ops.iou_pair(np.float32(a), np.float32(c)))
    assert iou_ab > 0.5 and iou_ac < 0.5
    det = _dets([a, b, c], [[0.9], [0.8], [0.7]])
    assert np.asarray(det.valid[0]).sum() == 2
    kept = np.asarray(det.boxes[0])[np.asarray(det.valid[0])]
    np.testing.assert_allclose(kept, [a, c], atol=1e-6)


def test_batched_and_static_shapes():
    rng = np.random.default_rng(0)
    boxes = np.concatenate(
        [rng.uniform(0.2, 0.8, (3, 50, 2)), rng.uniform(0.05, 0.2, (3, 50, 2))], -1
    ).astype(np.float32)
    scores = rng.uniform(0, 1, (3, 50, 4)).astype(np.float32)
    det = batched_nms(boxes, scores, max_detections=10, top_k_per_class=16)
    assert det.boxes.shape == (3, 10, 4)
    assert det.scores.shape == (3, 10)
    assert det.classes.shape == (3, 10)
    # scores sorted descending per image
    s = np.asarray(det.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
