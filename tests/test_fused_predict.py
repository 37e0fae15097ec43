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
