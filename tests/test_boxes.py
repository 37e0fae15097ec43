"""Golden-value tests for box geometry, ported from reference tests/utils/test_bbox.py:9-23."""

import numpy as np
import pytest

from ssd_object_detection_tpu.ops import boxes as box_ops


# (box_a, box_b, expected_iou) — reference tests/utils/test_bbox.py:10-17
IOU_CASES = [
    ([10, 10, 2, 2], [10, 10, 2, 2], 1.0),
    ([10, 10, 1, 1], [20, 20, 1, 1], 0.0),
    ([10, 10, 2, 2], [10, 10, 4, 4], 0.25),
    ([10, 10, 0, 0], [20, 20, 0, 0], 0.0),
    ([10, 10, -1, -1], [10, 10, -1, -1], 0.0),
    ([10, 10, 2, 2], [11, 11, 2, 2], 1 / 7),
    ([10, 10, 6, 6], [13, 13, 2, 2], 1 / 39),
    ([10, -10, 1, 1], [10, -10, 1, 1], 1.0),
]


@pytest.mark.parametrize("box_a,box_b,expected", IOU_CASES)
def test_iou_pair_golden(box_a, box_b, expected):
    got = float(box_ops.iou_pair(np.float32(box_a), np.float32(box_b)))
    assert got == pytest.approx(expected, abs=1e-4)


def test_iou_pair_rowwise_matches_reference_iou_n():
    """Reference iou_n clamps side lengths at 1e-10 (utils/bbox.py:39): identical boxes
    give 1, disjoint give ~0, containment gives area ratio."""
    a = np.float32([[10, 10, 2, 2], [10, 10, 1, 1], [10, 10, 2, 2]])
    b = np.float32([[10, 10, 2, 2], [20, 20, 1, 1], [10, 10, 4, 4]])
    got = np.asarray(box_ops.iou_pair(a, b, legacy_clamp=True))
    np.testing.assert_allclose(got, [1.0, 0.0, 0.25], atol=1e-4)


def test_pairwise_iou_matches_pair():
    rng = np.random.default_rng(0)
    a = np.abs(rng.normal(size=(7, 4)).astype(np.float32)) + 0.1
    b = np.abs(rng.normal(size=(11, 4)).astype(np.float32)) + 0.1
    mat = np.asarray(box_ops.pairwise_iou(a, b))
    assert mat.shape == (7, 11)
    for i in range(7):
        for j in range(11):
            assert mat[i, j] == pytest.approx(float(box_ops.iou_pair(a[i], b[j])), abs=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    anchors = np.abs(rng.normal(size=(50, 4)).astype(np.float32)) + 0.2
    gt = np.abs(rng.normal(size=(50, 4)).astype(np.float32)) + 0.2
    enc = box_ops.encode_boxes(gt, anchors)
    dec = np.asarray(box_ops.decode_boxes(enc, anchors))
    np.testing.assert_allclose(dec, gt, rtol=1e-4, atol=1e-5)


def test_encode_matches_reference_apply_anchor_box():
    """Independent numpy restatement of reference apply_anchor_box (utils/bbox.py:94-101)."""
    rng = np.random.default_rng(2)
    anchors = np.abs(rng.normal(size=(20, 4)).astype(np.float32)) + 0.2
    gt = np.abs(rng.normal(size=(20, 4)).astype(np.float32)) + 0.2
    expected_xy = (gt[:, :2] - anchors[:, :2]) / anchors[:, 2:]
    expected_wh = np.log(np.maximum(gt[:, 2:], 1e-5) / np.maximum(anchors[:, 2:], 1e-5))
    got = np.asarray(box_ops.encode_boxes(gt, anchors))
    np.testing.assert_allclose(got, np.concatenate([expected_xy, expected_wh], -1), rtol=1e-3, atol=1e-4)


def test_variance_encode_decode_roundtrip():
    rng = np.random.default_rng(3)
    anchors = np.abs(rng.normal(size=(8, 4)).astype(np.float32)) + 0.2
    gt = np.abs(rng.normal(size=(8, 4)).astype(np.float32)) + 0.2
    enc = box_ops.encode_boxes(gt, anchors, variances=(0.1, 0.2))
    dec = np.asarray(box_ops.decode_boxes(enc, anchors, variances=(0.1, 0.2)))
    np.testing.assert_allclose(dec, gt, rtol=1e-4, atol=1e-5)


def test_format_conversions():
    cxcywh = np.float32([[10, 20, 4, 6]])
    xyxy = np.asarray(box_ops.cxcywh_to_xyxy(cxcywh))
    np.testing.assert_allclose(xyxy, [[8, 17, 12, 23]])
    back = np.asarray(box_ops.xyxy_to_cxcywh(xyxy))
    np.testing.assert_allclose(back, cxcywh)
    xywh = np.float32([[8, 17, 4, 6]])  # COCO top-left format
    np.testing.assert_allclose(np.asarray(box_ops.xywh_to_cxcywh(xywh)), cxcywh)
