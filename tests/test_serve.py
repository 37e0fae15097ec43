"""Serving export/reload round-trip (new capability; reference has no serve path)."""

import jax
import jax.numpy as jnp
import numpy as np

from ssd_object_detection_tpu.eval.predict import make_predict_fn
from ssd_object_detection_tpu.eval.serve import export_detector, load_detector
from ssd_object_detection_tpu.models.ssd import SSD
from ssd_object_detection_tpu.ops.anchors import generate_anchors
from tests.test_train_step import NUM_CLASSES, TINY_ANCHORS, TINY_MODEL


def test_export_reload_matches_live_predict():
    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = generate_anchors(TINY_ANCHORS)

    blob = export_detector(model.apply, params, anchors, batch_size=2, image_size=64,
                           score_thresh=0.05)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    detect = load_detector(blob)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    served = detect(images)

    live = make_predict_fn(model.apply, anchors, score_thresh=0.05)(params, images)
    np.testing.assert_allclose(np.asarray(served.scores), np.asarray(live.scores), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(served.classes), np.asarray(live.classes))
    np.testing.assert_allclose(np.asarray(served.boxes), np.asarray(live.boxes), rtol=1e-4, atol=1e-6)


def test_ptq_export_reload_matches_live_quantized_predict():
    """The int8 PTQ path (ops/quant.py) exports through the same StableHLO
    serving contract: export_detector(q_apply, q_params) round-trips bit-stable
    vs the live quantized predict."""
    from ssd_object_detection_tpu.models.ssd import ModelSpec
    from ssd_object_detection_tpu.ops.anchors import AnchorSpec
    from ssd_object_detection_tpu.ops.quant import quantize_ssd

    anchor_spec = AnchorSpec(
        image_size=64, feature_sizes=((16, 16), (8, 8)),
        scale_refs=(13, 26, 52), aspect_ratios=((2,), (2,)),
    )
    spec = ModelSpec(
        name="q_serve", anchor_spec=anchor_spec, trunk="micro",
        blocks=(((160, 3, 1, "SAME"),), ((192, 3, 2, "SAME"),)),
    )
    model = SSD(num_classes=9, spec=spec)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    anchors = generate_anchors(anchor_spec)

    q_apply, q_params = quantize_ssd(model, params, [x], min_in_ch=128)
    assert q_params["quant"], "calibration found no eligible conv"

    blob = export_detector(q_apply, q_params, anchors, batch_size=2, image_size=64,
                           score_thresh=0.05)
    detect = load_detector(blob)
    images = (x + 1.0) / 2.0  # serving contract: [0,1] images
    served = detect(images)
    live = make_predict_fn(q_apply, anchors, score_thresh=0.05)(q_params, images)
    np.testing.assert_array_equal(np.asarray(served.classes), np.asarray(live.classes))
    np.testing.assert_allclose(np.asarray(served.scores), np.asarray(live.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(served.boxes), np.asarray(live.boxes),
                               rtol=1e-4, atol=1e-6)


def test_fused_export_reload_matches_live_fused_predict():
    """The fused uint8 serving contract (canvas + sizes in, detections out)
    round-trips through serialize/deserialize identically to the live path."""
    from ssd_object_detection_tpu.eval.predict import make_fused_predict_fn
    from ssd_object_detection_tpu.eval.serve import export_fused_detector
    from ssd_object_detection_tpu.ops.preprocess import pack_canvas

    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = generate_anchors(TINY_ANCHORS)

    blob = export_fused_detector(
        model.apply, params, anchors, batch_size=2, image_size=64,
        canvas_hw=(96, 96), score_thresh=0.05,
    )
    detect = load_detector(blob)

    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (80, 96, 3), np.uint8),
            rng.integers(0, 256, (64, 64, 3), np.uint8)]
    canvas, sizes = pack_canvas(imgs, (96, 96))
    canvas, sizes = jnp.asarray(canvas), jnp.asarray(sizes)
    served = detect(canvas, sizes)

    live = make_fused_predict_fn(
        model.apply, anchors, image_size=64, score_thresh=0.05
    )(params, canvas, sizes)
    np.testing.assert_allclose(
        np.asarray(served.scores), np.asarray(live.scores), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(served.classes), np.asarray(live.classes))
    np.testing.assert_allclose(
        np.asarray(served.boxes), np.asarray(live.boxes), rtol=1e-4, atol=1e-6
    )


def test_export_calibration_batches_normalization(tmp_path):
    """tools/export._calibration_batches must emit (x-0.5)*2-normalized batches
    from the synthetic dataset: float01 input -> values in [-1,1] centered near
    the synthetic base brightness (regression: the uint8 check once ran AFTER
    float32 conversion and was dead, risking a 255x calibration scale error)."""
    from tests.test_trainer import _tiny_config
    from tools.export import _calibration_batches

    cfg = _tiny_config(tmp_path)
    spec = TINY_MODEL
    batches = _calibration_batches(cfg, spec, n_batches=2, batch_size=2)
    assert len(batches) == 2
    for b in batches:
        arr = np.asarray(b)
        assert arr.shape == (2, spec.anchor_spec.image_size,
                             spec.anchor_spec.image_size, 3)
        assert arr.min() >= -1.0 and arr.max() <= 1.0
        # synthetic base brightness is 0.35-0.45 -> normalized mean near -0.2;
        # an erroneous /255 would put the mean near -1.0
        assert -0.5 < float(arr.mean()) < 0.2
