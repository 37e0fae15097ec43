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


def test_merged_top2_matches_merged_on_trained_like_scores():
    """merged_top2 restricts candidates to each anchor's top-2 classes before the
    global top-M (the bench.py decode). On realistic score distributions — softmax
    over logits with one dominant class per anchor — detections must be IDENTICAL
    to the exhaustive merged mode."""
    rng = np.random.default_rng(7)
    B, D, C = 2, 600, 9
    anchors = np.concatenate(
        [rng.uniform(0.1, 0.9, (D, 2)), rng.uniform(0.05, 0.3, (D, 2))], -1
    ).astype(np.float32)
    pred_loc = (rng.normal(size=(B, D, 4)) * 0.1).astype(np.float32)
    # trained-like logits: background-dominant, a sprinkle of confident single-class
    # foreground anchors (what a converged SSD emits)
    logits = rng.normal(size=(B, D, C)).astype(np.float32)
    logits[..., -1] += 6.0
    for b in range(B):
        fg = rng.choice(D, 40, replace=False)
        logits[b, fg, rng.integers(0, C - 1, 40)] += 12.0
    kwargs = dict(pre_nms_top_k=200, max_detections=50, score_thresh=0.01)
    full = detect_from_logits(
        jnp.asarray(pred_loc), jnp.asarray(logits), jnp.asarray(anchors),
        nms_mode="merged", **kwargs,
    )
    top2 = detect_from_logits(
        jnp.asarray(pred_loc), jnp.asarray(logits), jnp.asarray(anchors),
        nms_mode="merged_top2", **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(full.valid), np.asarray(top2.valid))
    np.testing.assert_array_equal(np.asarray(full.classes), np.asarray(top2.classes))
    np.testing.assert_allclose(np.asarray(full.scores), np.asarray(top2.scores), atol=1e-7)
    np.testing.assert_allclose(np.asarray(full.boxes), np.asarray(top2.boxes), atol=1e-7)


def test_merged_top2_drops_third_class_of_same_anchor():
    """Documented divergence semantics: when one anchor carries 3+ classes that all
    belong in the candidate set, merged_top2 keeps only its best two."""
    from ssd_object_detection_tpu.ops.nms import nms_on_pool_merged

    boxes = jnp.asarray([[[0.3, 0.3, 0.1, 0.1], [0.8, 0.8, 0.1, 0.1]]], jnp.float32)
    scores = np.zeros((1, 2, 4), np.float32)
    scores[0, 0] = [0.9, 0.8, 0.7, 0.0]  # one anchor, three confident classes
    scores[0, 1, 3] = 0.5
    full = nms_on_pool_merged(boxes, jnp.asarray(scores), iou_thresh=0.5)
    top2 = nms_on_pool_merged(
        boxes, jnp.asarray(scores), iou_thresh=0.5, per_anchor_top2=True
    )
    full_kept = sorted(
        round(float(s), 2) for s, v in zip(np.asarray(full.scores[0]), np.asarray(full.valid[0])) if v
    )
    top2_kept = sorted(
        round(float(s), 2) for s, v in zip(np.asarray(top2.scores[0]), np.asarray(top2.valid[0])) if v
    )
    assert full_kept == [0.5, 0.7, 0.8, 0.9], full_kept
    assert top2_kept == [0.5, 0.8, 0.9], top2_kept  # class 2 (0.7) dropped


def test_bf16_conf_output_detections_bitwise_match_f32():
    """SSD(conf_f32=False) must produce bit-identical detections to the default
    f32-output model: the f32 cast is exact on bf16 values and detect_from_logits
    casts inside its reductions (the bench.py configuration's exactness claim)."""
    from ssd_object_detection_tpu.models.ssd import SSD, ModelSpec
    from ssd_object_detection_tpu.ops.anchors import AnchorSpec

    # the dryrun-scale micro trunk (same construction as __graft_entry__.py)
    anchor_spec = AnchorSpec(
        image_size=32, feature_sizes=((8, 8), (4, 4)),
        scale_refs=(7, 13, 26), aspect_ratios=((2,), (2,)),
    )
    spec = ModelSpec(
        name="dryrun", anchor_spec=anchor_spec, trunk="micro",
        blocks=(((64, 3, 1, "SAME"),), ((64, 3, 2, "SAME"),)),
    )
    m32 = SSD(num_classes=9, spec=spec, dtype=jnp.bfloat16, conf_f32=True)
    m16 = SSD(num_classes=9, spec=spec, dtype=jnp.bfloat16, conf_f32=False)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    params = m32.init(jax.random.PRNGKey(0), x)
    loc32, conf32 = m32.apply(params, x)
    loc16, conf16 = m16.apply(params, x)
    assert conf32.dtype == jnp.float32 and conf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(loc32), np.asarray(loc16))
    np.testing.assert_array_equal(
        np.asarray(conf32), np.asarray(conf16.astype(jnp.float32))
    )

    anchors = np.concatenate(
        [np.full((conf32.shape[1], 2), 0.5), np.full((conf32.shape[1], 2), 0.1)], -1
    ).astype(np.float32)
    det32 = detect_from_logits(loc32, conf32, jnp.asarray(anchors), pre_nms_top_k=50)
    det16 = detect_from_logits(loc16, conf16, jnp.asarray(anchors), pre_nms_top_k=50)
    np.testing.assert_array_equal(np.asarray(det32.valid), np.asarray(det16.valid))
    np.testing.assert_array_equal(np.asarray(det32.scores), np.asarray(det16.scores))
    np.testing.assert_array_equal(np.asarray(det32.boxes), np.asarray(det16.boxes))
