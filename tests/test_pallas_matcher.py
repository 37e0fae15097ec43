"""Pallas matcher kernel (interpret mode on CPU) vs the XLA matcher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.ops.matching import match_anchors
from ssd_object_detection_tpu.ops.pallas_matcher import match_anchors_pallas


def _random_case(seed, batch=3, n_gt=6, n_anchor=40, valid_p=0.7):
    rng = np.random.default_rng(seed)
    anchors = np.concatenate(
        [rng.uniform(0, 1, (n_anchor, 2)), rng.uniform(0.05, 0.5, (n_anchor, 2))], -1
    ).astype(np.float32)
    gt_boxes = np.concatenate(
        [rng.uniform(0, 1, (batch, n_gt, 2)), rng.uniform(0.05, 0.5, (batch, n_gt, 2))], -1
    ).astype(np.float32)
    gt_cls = rng.integers(0, 80, (batch, n_gt)).astype(np.int32)
    gt_valid = rng.uniform(size=(batch, n_gt)) < valid_p
    gt_valid[:, 0] = True
    return gt_cls, gt_boxes, gt_valid, anchors


@pytest.mark.parametrize("seed", range(5))
def test_pallas_matches_xla(seed):
    gt_cls, gt_boxes, gt_valid, anchors = _random_case(seed)
    got = match_anchors_pallas(gt_cls, gt_boxes, gt_valid, anchors, interpret=True)
    for b in range(gt_cls.shape[0]):
        want = match_anchors(gt_cls[b], gt_boxes[b], gt_valid[b], anchors)
        np.testing.assert_array_equal(np.asarray(got.gt_index[b]), np.asarray(want.gt_index))
        np.testing.assert_array_equal(np.asarray(got.cls[b]), np.asarray(want.cls))
        np.testing.assert_array_equal(np.asarray(got.mask[b]), np.asarray(want.mask))
        np.testing.assert_allclose(np.asarray(got.box[b]), np.asarray(want.box), atol=1e-6)


def test_pallas_golden_bipartite():
    """Reference tests/utils/test_bbox.py:39-44 golden case through the kernel."""
    anchors = np.float32([[10, 10, 1, 1], [20, 20, 1.1, 1.1], [20, 20, 0.5, 0.5]])
    gt_boxes = np.float32([[[15, 15, 13, 13], [15, 15, 14, 14]]])
    gt_cls = np.int32([[0, 1]])
    gt_valid = np.ones((1, 2), bool)
    res = match_anchors_pallas(gt_cls, gt_boxes, gt_valid, anchors, interpret=True)
    np.testing.assert_allclose(
        np.asarray(res.box[0]), [[15, 15, 14, 14], [15, 15, 13, 13], [0, 0, 0, 0]], atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(res.cls[0]), [1, 0, 0])


def test_pallas_zero_valid():
    anchors = np.float32([[0.5, 0.5, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1]])
    res = match_anchors_pallas(
        np.zeros((2, 3), np.int32), np.zeros((2, 3, 4), np.float32),
        np.zeros((2, 3), bool), anchors, interpret=True,
    )
    assert not np.asarray(res.mask).any()


def test_pallas_nonaligned_anchor_count():
    """D=8732 is not a lane multiple; padding columns must never match."""
    gt_cls, gt_boxes, gt_valid, _ = _random_case(9, batch=2, n_gt=4)
    rng = np.random.default_rng(9)
    anchors = np.concatenate(
        [rng.uniform(0, 1, (130, 2)), rng.uniform(0.05, 0.5, (130, 2))], -1
    ).astype(np.float32)
    got = match_anchors_pallas(gt_cls, gt_boxes, gt_valid, anchors, interpret=True)
    for b in range(2):
        want = match_anchors(gt_cls[b], gt_boxes[b], gt_valid[b], anchors)
        np.testing.assert_array_equal(np.asarray(got.gt_index[b]), np.asarray(want.gt_index))


def test_chunked_kernel_matches_xla_at_ssd512_scale():
    """Anchor counts that trigger the kernel's column-chunked passes (>12 MB for
    three full (G, D) planes) must still produce identical assignments."""
    rng = np.random.default_rng(7)
    num_anchors = 12700  # d_pad 12800 -> 3*100*12800*4 = 15.4 MB -> chunked
    max_gt = 100
    anchors = np.concatenate(
        [rng.uniform(0.05, 0.95, (num_anchors, 2)), rng.uniform(0.03, 0.4, (num_anchors, 2))],
        -1,
    ).astype(np.float32)
    B = 2
    gt_boxes = np.concatenate(
        [rng.uniform(0.2, 0.8, (B, max_gt, 2)), rng.uniform(0.05, 0.4, (B, max_gt, 2))], -1
    ).astype(np.float32)
    gt_cls = rng.integers(0, 80, (B, max_gt)).astype(np.int32)
    gt_valid = rng.uniform(size=(B, max_gt)) < 0.12

    got = match_anchors_pallas(
        jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid),
        jnp.asarray(anchors), interpret=True,
    )
    want = jax.vmap(
        lambda c, b, v: match_anchors(c, b, v, jnp.asarray(anchors))
    )(jnp.asarray(gt_cls), jnp.asarray(gt_boxes), jnp.asarray(gt_valid))
    np.testing.assert_array_equal(np.asarray(got.gt_index), np.asarray(want.gt_index))
    np.testing.assert_array_equal(np.asarray(got.cls), np.asarray(want.cls))
    np.testing.assert_allclose(np.asarray(got.box), np.asarray(want.box), atol=1e-6)
