"""Measure the reference stack's inference speed (BASELINE.md to-measure item #1).

Builds the reference's architecture with tf.keras — VGG16 trunk (weights=None; no
egress for ImageNet weights) truncated at block3_conv3 + the SSD extra stack + heads,
per reference models/ssd_model.py:74-171 — and times eager single-image forward +
host-side threshold decode on CPU, i.e. what the reference actually executes
(it is eager, single-device, and has no jit; SURVEY.md section 3.3).

This is a measurement harness, not part of the framework.
"""

import json
import os
import time

os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import numpy as np


def build_reference_model():
    import tensorflow as tf
    from tensorflow.keras import Model, layers

    classes = 81
    inp = layers.Input(shape=(300, 300, 3))
    vgg = tf.keras.applications.VGG16(include_top=False, weights=None, input_shape=(300, 300, 3))
    trunk = Model(vgg.input, vgg.get_layer("block3_conv3").output)(inp)
    x = layers.MaxPool2D(2, 2, padding="same")(trunk)

    # extra stack: (filters, kernel, stride, padding, tap_after)
    stack = [
        (512, 3, 1, "same", False), (512, 3, 1, "same", False), (512, 1, 1, "same", True),
        (1024, 3, 2, "same", False), (1024, 1, 1, "same", True),
        (256, 1, 1, "same", False), (512, 3, 2, "same", True),
        (128, 1, 1, "same", False), (256, 3, 2, "same", True),
        (128, 1, 1, "same", False), (256, 3, 1, "valid", True),
        (128, 1, 1, "same", False), (256, 3, 1, "valid", True),
    ]
    taps = []
    for filters, k, s, pad, tap in stack:
        x = layers.Conv2D(filters, k, strides=s, padding=pad, activation="relu")(x)
        if tap:
            taps.append(x)

    num_priors = [4, 6, 6, 6, 4, 4]
    locs = [layers.Conv2D(n * 4, 3, padding="same")(t) for n, t in zip(num_priors, taps)]
    confs = [layers.Conv2D(n * classes, 3, padding="same")(t) for n, t in zip(num_priors, taps)]
    loc = layers.Concatenate(axis=-2)([layers.Reshape((-1, 4))(o) for o in locs])
    conf = layers.Concatenate(axis=-2)([layers.Reshape((-1, classes))(o) for o in confs])
    return Model(inp, [loc, conf])


def main():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    model = build_reference_model()
    assert model.outputs[0].shape[1] == 8732

    rng = np.random.default_rng(0)
    results = {}
    for batch in (1, 32):
        x = tf.constant(rng.uniform(-1, 1, (batch, 300, 300, 3)).astype(np.float32))
        loc, conf = model(x, training=False)  # warmup
        n = 10 if batch == 1 else 3
        t0 = time.perf_counter()
        for _ in range(n):
            loc, conf = model(x, training=False)
            # reference-style host decode: softmax + threshold (models/ssd_model.py:479-484)
            probs = tf.nn.softmax(conf).numpy()
            mask = (probs[..., :-1].max(-1) > 0.5) & (probs[..., -1] <= 0.5)
        dt = (time.perf_counter() - t0) / n
        results[f"batch_{batch}"] = {
            "ms": round(dt * 1000, 1),
            "images_per_sec": round(batch / dt, 2),
        }
    print(json.dumps({"stack": "reference-equivalent tf.keras eager, CPU", **results}))


if __name__ == "__main__":
    main()
