"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: SSD300 FULLY-FUSED end-to-end inference images/sec/chip — uint8 camera-size
canvases in, detections out: on-device resize + normalize + forward + softmax +
decode + class-aware NMS in one jit (BASELINE.json config #2 as written: the host
keeps only JPEG decode), batch 32, bfloat16 compute. Round 1 benchmarked pre-resized
float tensors; this measures strictly more work per image.

vs_baseline: the reference publishes NO numbers (BASELINE.md); the driver's north star
is ">5x A100 images/sec/chip for SSD300 inference". We anchor against 2000 img/s — an
estimate of optimized A100 SSD300-VGG16 fp16 batch-32 inference throughput (NVIDIA's
SSD300 reference implementations land in the 1500-3000 img/s range) — so
vs_baseline > 5.0 means the north star is met. See BASELINE.md for the measured
roofline analysis of where the ceiling sits on v5e.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

A100_SSD300_INFER_IMG_PER_SEC = 2000.0

BATCH = 32
WARMUP_ITERS = 5
BENCH_ITERS = 30


def main():
    from ssd_object_detection_tpu.eval.predict import make_fused_predict_fn
    from ssd_object_detection_tpu.models.ssd import SSD, SSD300_SPEC_MODEL
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.ops.preprocess import pack_canvas

    model = SSD(num_classes=81, spec=SSD300_SPEC_MODEL, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    anchors = generate_anchors(SSD300_SPEC_MODEL.anchor_spec)
    predict = make_fused_predict_fn(model.apply, anchors)

    # COCO-shaped inputs: 480x640 uint8 images in a 640x640 planar canvas
    rng = np.random.default_rng(0)
    canvas, sizes = pack_canvas(
        [rng.integers(0, 256, (480, 640, 3), np.uint8) for _ in range(BATCH)]
    )
    canvas, sizes = jnp.asarray(canvas), jnp.asarray(sizes)

    # Timing methodology: on the axon-tunneled TPU, jax.block_until_ready does NOT
    # synchronize; a device->host scalar fetch does (first fetch pays a one-time
    # ~45s handshake, subsequent fetches ~28ms). Warm up compile + fetch path, then
    # time a dispatch loop ended by one scalar fetch.
    for _ in range(WARMUP_ITERS):
        det = predict(params, canvas, sizes)
    float(det.scores[0, 0])  # true sync incl. one-time handshake

    t0 = time.perf_counter()
    for _ in range(BENCH_ITERS):
        det = predict(params, canvas, sizes)
    float(det.scores[0, 0])  # true sync
    dt = (time.perf_counter() - t0) / BENCH_ITERS

    images_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "ssd300_fused_e2e_infer_images_per_sec_per_chip",
        "value": round(images_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / A100_SSD300_INFER_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
