"""The fused logit-space predict path must match the reference path
(full softmax + full decode + ops/nms.batched_nms) detection-for-detection."""

import jax
import jax.numpy as jnp
import numpy as np

from ssd_object_detection_tpu.eval.predict import detect_from_logits
from ssd_object_detection_tpu.ops import boxes as box_ops
from ssd_object_detection_tpu.ops.nms import batched_nms


def test_fused_predict_matches_reference_path():
    rng = np.random.default_rng(0)
    B, D, C = 2, 500, 9  # C includes background (last)
    anchors = np.concatenate(
        [rng.uniform(0.1, 0.9, (D, 2)), rng.uniform(0.05, 0.3, (D, 2))], -1
    ).astype(np.float32)
    pred_loc = (rng.normal(size=(B, D, 4)) * 0.1).astype(np.float32)
    logits = (rng.normal(size=(B, D, C)) * 2).astype(np.float32)

    fused = detect_from_logits(
        jnp.asarray(pred_loc), jnp.asarray(logits), jnp.asarray(anchors),
        pre_nms_top_k=100, top_k_per_class=50, max_detections=60,
        nms_mode="per_class",
    )

    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))[..., :-1]
    boxes = np.asarray(box_ops.decode_boxes(pred_loc, anchors[None]))
    ref = batched_nms(
        jnp.asarray(boxes), jnp.asarray(probs),
        pre_nms_top_k=100, top_k_per_class=50, max_detections=60,
    )

    np.testing.assert_array_equal(np.asarray(fused.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(fused.classes), np.asarray(ref.classes))
    np.testing.assert_allclose(np.asarray(fused.scores), np.asarray(ref.scores), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fused.boxes), np.asarray(ref.boxes), rtol=1e-4, atol=1e-6)


def test_fused_predict_empty_scene():
    rng = np.random.default_rng(1)
    B, D, C = 1, 100, 5
    anchors = np.concatenate(
        [rng.uniform(0.1, 0.9, (D, 2)), rng.uniform(0.05, 0.3, (D, 2))], -1
    ).astype(np.float32)
    logits = np.zeros((B, D, C), np.float32)
    logits[..., -1] = 20.0  # everything confidently background
    det = detect_from_logits(
        jnp.zeros((B, D, 4)), jnp.asarray(logits), jnp.asarray(anchors)
    )
    assert not np.asarray(det.valid).any()


def test_merged_mode_matches_per_class_on_sparse_scene():
    """With few, well-separated candidates both NMS modes must return identical
    detections (they can differ only past the global top-M candidate horizon)."""
    rng = np.random.default_rng(2)
    B, D, C = 2, 300, 9
    anchors = np.concatenate(
        [rng.uniform(0.1, 0.9, (D, 2)), rng.uniform(0.05, 0.2, (D, 2))], -1
    ).astype(np.float32)
    pred_loc = np.zeros((B, D, 4), np.float32)
    logits = np.full((B, D, C), -8.0, np.float32)
    logits[..., -1] = 8.0  # background everywhere ...
    for b in range(B):
        for i, cls in ((5, 0), (50, 3), (120, 7), (200, 1)):
            logits[b, i, cls] = 9.0  # ... except a few confident objects
            logits[b, i, -1] = -9.0

    kwargs = dict(pre_nms_top_k=100, max_detections=20, score_thresh=0.2)
    merged = detect_from_logits(
        jnp.asarray(pred_loc), jnp.asarray(logits), jnp.asarray(anchors),
        nms_mode="merged", **kwargs,
    )
    per_class = detect_from_logits(
        jnp.asarray(pred_loc), jnp.asarray(logits), jnp.asarray(anchors),
        nms_mode="per_class", **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(merged.valid), np.asarray(per_class.valid))
    np.testing.assert_array_equal(np.asarray(merged.classes), np.asarray(per_class.classes))
    np.testing.assert_allclose(
        np.asarray(merged.boxes), np.asarray(per_class.boxes), atol=1e-6
    )


def test_merged_mode_suppresses_within_class_only():
    """Two overlapping boxes of DIFFERENT classes both survive; same class -> one."""
    from ssd_object_detection_tpu.ops.nms import nms_on_pool_merged

    boxes = jnp.asarray(
        [[[0.5, 0.5, 0.2, 0.2], [0.52, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1]]],
        jnp.float32,
    )
    # candidate 0: class 0 @ .9; candidate 1: class 0 @ .8 AND class 1 @ .7
    scores = np.zeros((1, 3, 2), np.float32)
    scores[0, 0, 0] = 0.9
    scores[0, 1, 0] = 0.8  # same class, heavy overlap -> suppressed
    scores[0, 1, 1] = 0.7  # different class, same box -> survives
    scores[0, 2, 1] = 0.6
    det = nms_on_pool_merged(boxes, jnp.asarray(scores), iou_thresh=0.5)
    got = sorted(
        (round(float(s), 2), int(c))
        for s, c, v in zip(
            np.asarray(det.scores[0]), np.asarray(det.classes[0]), np.asarray(det.valid[0])
        )
        if v
    )
    assert got == [(0.6, 1), (0.7, 1), (0.9, 0)], got
