"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: SSD300 FULLY-FUSED end-to-end inference images/sec/chip — uint8 camera-size
canvases in, detections out: on-device resize + normalize + forward + softmax +
decode + class-aware NMS in one jit (BASELINE.json config #2 as written: the host
keeps only JPEG decode), batch 32, in the PRODUCTION SERVING precision: int8 PTQ
on the MXU-eligible convs (ops/quant.py), bf16 everywhere else.

Why int8 is the headline (round 3): the v5e MXU runs int8 at 2x the bf16 rate.
Selective PTQ (only >=128-input-channel convs quantize, INCLUDING the 12 loc/conf
head convs — they read the widest feature maps; early convs, decode, NMS stay
bf16/f32) measured 2,383 img/s heads-on / 2,326 heads-off vs 1,815 bf16 at the
pinned batch 32 — and the accuracy gate (EVAL_SYNTHETIC_PTQ.json: float vs int8
mAP on the same trained weights, drop <= 0.02 required, evaluated for BOTH the
selective and heads-on variants) shows the quantization is essentially free
(measured drop 0.000 at mAP@0.5). The 2,000 img/s anchor is itself a TensorRT-CLASS A100 estimate, and
TensorRT-class deployments are int8 — this is the like-for-like serving config.
The bf16 exact-numerics path is measured alongside and reported in the same JSON
line (`bf16_images_per_sec`).

Round-3 configuration (each measured, BASELINE.md):
  - PIPELINE=16 batches per dispatch (jax.lax.map): through the axon tunnel each jit
    call costs ~4 ms of host dispatch that the device spends idle; production
    serving keeps multiple batches in flight, so the harness does too. The model
    still executes at batch 32 — per-image compute is unchanged.
  - conf logits stay bf16 through the ranking stage (SSD conf_f32=False): the f32
    output cast added no information (heads compute in bf16) but doubled the HBM
    traffic of every pass over the (32, 8732, 81) tensor; ranking casts to f32
    inside its fused reductions, so pool selection is bit-identical.
  - nms_mode="merged_top2": per-anchor top-2 class candidates ahead of the global
    top-256 — kills the (32, 32000) top-k custom-call (1.11 ms -> ~0.3). Identical
    detections unless one anchor confidently detects 3+ overlapping objects of
    different classes (ops/nms.py; mAP-parity evidence in EVAL_SYNTHETIC.json).
  - quantization scales here are synthetic (random weights carry no calibratable
    signal); int8 throughput is scale-independent — identical ops either way. The
    accuracy evidence uses really-calibrated scales (tools/eval_synthetic.py --ptq).

vs_baseline: the reference publishes NO numbers (BASELINE.md); the driver's north star
is ">5x A100 images/sec/chip for SSD300 inference". We anchor against 2000 img/s — an
estimate of optimized (TensorRT-class) A100 SSD300-VGG16 batch-32 inference
throughput (NVIDIA's SSD300 reference implementations land in the 1500-3000 img/s
range) — so vs_baseline > 5.0 means the north star is met. See BASELINE.md for the
measured roofline analysis of where the ceiling sits on v5e.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Persistent compilation cache (same dir as tests/conftest.py and
# __graft_entry__.py): both bench programs compile in minutes cold; a warm cache
# makes re-runs start in seconds.
from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

A100_SSD300_INFER_IMG_PER_SEC = 2000.0

BATCH = 32
PIPELINE = 16  # batches in flight per dispatch
WARMUP_ITERS = 3
BENCH_ITERS = 4  # dispatches; BENCH_ITERS * PIPELINE batches total


def main():
    from ssd_object_detection_tpu.eval.predict import make_fused_predict_fn
    from ssd_object_detection_tpu.models.ssd import SSD, SSD300_SPEC_MODEL
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.ops.preprocess import pack_canvas
    from ssd_object_detection_tpu.ops.quant import quantize_synthetic

    model = SSD(num_classes=81, spec=SSD300_SPEC_MODEL, dtype=jnp.bfloat16,
                conf_f32=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    anchors = generate_anchors(SSD300_SPEC_MODEL.anchor_spec)

    # PTQ with synthetic per-tensor scales: eligibility is discovered by an
    # ABSTRACT trace (no extra device compile — a real `calibrate` forward would
    # add minutes of compile for scale values that cannot change the timing).
    q_apply, q_params, _ = quantize_synthetic(
        model, params, (BATCH, 300, 300, 3), include_heads=True
    )

    # COCO-shaped inputs: 480x640 uint8 images in a 640x640 planar canvas,
    # PIPELINE distinct batches.
    rng = np.random.default_rng(0)
    packed = [
        pack_canvas([rng.integers(0, 256, (480, 640, 3), np.uint8)
                     for _ in range(BATCH)])
        for _ in range(PIPELINE)
    ]
    canvases = jnp.stack([jnp.asarray(c) for c, _ in packed])  # (P, B, 3, Hc, Wc)
    sizes = jnp.stack([jnp.asarray(s) for _, s in packed])  # (P, B, 2)

    def measure(apply_fn, run_params):
        predict = make_fused_predict_fn(apply_fn, anchors, nms_mode="merged_top2")

        @jax.jit
        def predict_pipelined(p, canvases, sizes):
            return jax.lax.map(lambda cs: predict(p, cs[0], cs[1]), (canvases, sizes))

        # Timing methodology: on the axon-tunneled TPU, jax.block_until_ready does
        # NOT synchronize; a device->host scalar fetch does (first fetch pays a
        # one-time ~45s handshake, subsequent fetches ~28ms). Warm up compile +
        # fetch path, then time a dispatch loop ended by one scalar fetch.
        for _ in range(WARMUP_ITERS):
            det = predict_pipelined(run_params, canvases, sizes)
        float(det.scores[0, 0, 0])  # true sync incl. one-time handshake

        t0 = time.perf_counter()
        for _ in range(BENCH_ITERS):
            det = predict_pipelined(run_params, canvases, sizes)
        float(det.scores[0, 0, 0])  # true sync
        dt = (time.perf_counter() - t0) / (BENCH_ITERS * PIPELINE)
        return BATCH / dt

    int8_ips = measure(q_apply, q_params)
    bf16_ips = measure(model.apply, params)

    print(json.dumps({
        "metric": "ssd300_fused_e2e_infer_images_per_sec_per_chip",
        "value": round(int8_ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(int8_ips / A100_SSD300_INFER_IMG_PER_SEC, 3),
        "precision": "int8-ptq convs (accuracy gate EVAL_SYNTHETIC_PTQ.json), bf16 elsewhere",
        "bf16_images_per_sec": round(bf16_ips, 1),
        "bf16_vs_baseline": round(bf16_ips / A100_SSD300_INFER_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
