"""Visualization + introspection utility tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from ssd_object_detection_tpu.models.ssd import SSD
from ssd_object_detection_tpu.ops.anchors import generate_anchors
from ssd_object_detection_tpu.utils import viz
from ssd_object_detection_tpu.utils.introspect import flops_analysis, param_summary
from tests.test_train_step import NUM_CLASSES, TINY_ANCHORS, TINY_MODEL


def test_draw_bbox_renders():
    img = np.zeros((100, 100, 3), np.float32)
    out = viz.draw_bbox(
        img, [(50, 50, 30, 20)], [0], ["person"], [(255, 0, 0)], scores=[0.9]
    )
    assert out.dtype == np.uint8 and out.shape == (100, 100, 3)
    assert out.any()  # something was drawn


def test_draw_bbox_clips_extreme_coords():
    img = np.zeros((50, 50, 3), np.uint8)
    out = viz.draw_bbox(img, [(1e9, -1e9, 1e9, 1e9)], [0], ["x"], [(0, 255, 0)], show_names=False)
    assert out.shape == (50, 50, 3)


def test_render_targets_roundtrip():
    anchors = generate_anchors(TINY_ANCHORS)
    img = np.zeros((64, 64, 3), np.float32)
    cls = np.zeros((anchors.shape[0],), np.int32)
    loc = np.zeros((anchors.shape[0], 4), np.float32)  # zero offsets = the anchor box
    mask = np.zeros((anchors.shape[0],), bool)
    mask[10] = True
    out = viz.render_targets(img, cls, loc, mask, anchors, ["a"], [(255, 255, 255)])
    assert out.any()


def test_render_predictions_thresholds():
    anchors = generate_anchors(TINY_ANCHORS)
    D = anchors.shape[0]
    logits = np.full((D, 3), -10.0, np.float32)
    logits[:, -1] = 10.0  # all background
    logits[5, 0], logits[5, -1] = 10.0, -10.0  # one confident fg
    out = viz.render_predictions(
        np.zeros((64, 64, 3), np.float32), np.zeros((D, 4), np.float32), logits,
        anchors, ["a", "b"], [(255, 0, 0), (0, 255, 0)],
    )
    assert out.any()


def test_render_anchor_grid():
    anchors = generate_anchors(TINY_ANCHORS)
    out = viz.render_anchor_grid(anchors, image_size=64, max_cells=2)
    assert out.shape == (64, 128, 3)
    assert out.any()


def test_param_summary():
    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    s = param_summary(params)
    assert "TOTAL" in s and "block1_conv1" in s and "conf_head0" in s


def test_flops_analysis():
    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    cost = flops_analysis(lambda x: model.apply(params, x), jnp.zeros((1, 64, 64, 3)))
    assert cost.get("flops", 0) > 1e6  # tiny model still has megaflops


def test_checked_loss_passes_on_valid_input():
    from ssd_object_detection_tpu.utils.debug import checked_multibox_loss

    rng = np.random.default_rng(0)
    B, D, C = 2, 32, 5
    gt_cls = rng.integers(0, C - 1, (B, D)).astype(np.int32)
    gt_loc = rng.normal(size=(B, D, 4)).astype(np.float32)
    mask = rng.uniform(size=(B, D)) < 0.2
    mask[0, 0] = True
    err, info = checked_multibox_loss(
        gt_cls, gt_loc, mask,
        rng.normal(size=(B, D, 4)).astype(np.float32),
        rng.normal(size=(B, D, C)).astype(np.float32),
    )
    err.throw()  # no violation
    assert np.isfinite(float(info.total))


def test_checked_loss_catches_nan():
    from ssd_object_detection_tpu.utils.debug import checked_multibox_loss

    B, D, C = 1, 8, 4
    bad_loc = np.zeros((B, D, 4), np.float32)
    bad_loc[0, 0, 0] = np.nan
    err, _ = checked_multibox_loss(
        np.zeros((B, D), np.int32), np.zeros((B, D, 4), np.float32),
        np.ones((B, D), bool), bad_loc, np.zeros((B, D, C), np.float32),
    )
    with pytest.raises(Exception):
        err.throw()
