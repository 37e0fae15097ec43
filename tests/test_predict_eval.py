"""End-to-end inference + evaluation: overfit a tiny SSD, then verify the jitted
predict path (decode + NMS) recovers the objects and the mAP runner scores it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset
from ssd_object_detection_tpu.eval.predict import make_predict_fn
from ssd_object_detection_tpu.eval.runner import evaluate_batches
from ssd_object_detection_tpu.models.ssd import SSD
from ssd_object_detection_tpu.ops.anchors import generate_anchors
from ssd_object_detection_tpu.train.optim import make_optimizer
from ssd_object_detection_tpu.train.step import StepConfig, create_train_state, make_train_step
from tests.test_train_step import NUM_CLASSES, TINY_ANCHORS, TINY_MODEL


@pytest.fixture(scope="module")
def overfit_setup():
    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = generate_anchors(TINY_ANCHORS)
    tx = make_optimizer("adam", 3e-3)
    step_fn = make_train_step(model.apply, anchors, tx, StepConfig())
    state = create_train_state(params, tx)
    ds = SyntheticDetectionDataset(num_images=4, image_size=64, max_gt=4, num_classes=8, seed=7)
    batch = next(ds.batches(batch_size=4))
    for _ in range(250):
        state, metrics = step_fn(state, batch)
    return model, state.params, anchors, ds, batch, float(metrics["loss"])


def test_predict_shapes_and_validity(overfit_setup):
    model, params, anchors, ds, batch, _ = overfit_setup
    predict = make_predict_fn(model.apply, anchors, score_thresh=0.3)
    det = predict(params, jnp.asarray(batch["image"]))
    assert det.boxes.shape == (4, 100, 4)
    assert det.scores.shape == (4, 100)
    s = np.asarray(det.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # sorted
    assert np.asarray(det.valid).any()  # overfit model detects something


def test_overfit_predictions_match_gt(overfit_setup):
    model, params, anchors, ds, batch, loss = overfit_setup
    assert loss < 1.0, f"overfit did not converge (loss {loss})"
    predict = make_predict_fn(model.apply, anchors, score_thresh=0.5)
    metrics = evaluate_batches(predict, params, [batch], num_classes=8)
    # an overfit model on its own train images should score very high mAP@0.5
    assert metrics["mAP@0.5"] > 0.5, metrics


def test_eval_runner_scales_to_orig_size(overfit_setup):
    model, params, anchors, ds, batch, _ = overfit_setup
    predict = make_predict_fn(model.apply, anchors, score_thresh=0.5)
    batch2 = dict(batch)
    batch2["orig_size"] = np.tile(np.int32([480, 640]), (4, 1))
    m_scaled = evaluate_batches(predict, params, [batch2], num_classes=8)
    m_plain = evaluate_batches(predict, params, [batch], num_classes=8)
    # mAP is scale-invariant when both dets and GTs scale together
    assert m_scaled["mAP@0.5"] == pytest.approx(m_plain["mAP@0.5"], abs=1e-6)
