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
