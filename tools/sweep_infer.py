"""Inference throughput sweep: batch size x (s2d stem | fused uint8 e2e) per variant.

`--fused` sweeps the fully-fused uint8 path (canvas resize + normalize + forward +
NMS, one jit) — the latency/throughput curve for BASELINE config #2.

Measurement methodology per memory/BASELINE.md: dispatch loop ended by a scalar fetch
(block_until_ready does not synchronize through the axon tunnel); inputs device-resident.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, sync, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="32,64,128")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--variant", type=str, default="ssd300")
    p.add_argument("--fused", action="store_true",
                   help="sweep the fused uint8 e2e path instead of the s2d A/B")
    p.add_argument("--fast-decode", action="store_true",
                   help="bench.py's round-3 decode config: bf16 conf logits "
                   "(conf_f32=False) + nms_mode=merged_top2 (only affects --fused)")
    p.add_argument("--ptq", action="store_true",
                   help="int8-quantize the MXU-eligible convs (ops/quant.py, "
                   "abstract-trace eligibility + synthetic scales — timing is "
                   "scale-independent); only affects --fused")
    p.add_argument("--ptq-heads", action="store_true",
                   help="with --ptq: also quantize the loc/conf head convs")
    args = p.parse_args()

    from ssd_object_detection_tpu.eval.predict import make_fused_predict_fn, make_predict_fn
    from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.ops.preprocess import pack_canvas

    spec = MODEL_SPECS[args.variant]
    size = spec.image_size
    anchors = generate_anchors(spec.anchor_spec)
    m_plain = SSD(num_classes=81, spec=spec, dtype=jnp.bfloat16, s2d_stem=False,
                  conf_f32=not args.fast_decode)
    # the s2d stem is a VGG-conv1 rewrite (ignored by other trunks,
    # models/ssd.py); only A/B it where it changes the program
    stems = [("plain", m_plain)]
    if not args.fused and spec.trunk == "vgg16":
        stems.append(("s2d", SSD(num_classes=81, spec=spec, dtype=jnp.bfloat16, s2d_stem=True)))
    params = m_plain.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))

    apply_fn, run_params = m_plain.apply, params
    if args.ptq:
        from ssd_object_detection_tpu.ops.quant import quantize_synthetic

        apply_fn, run_params, n_q = quantize_synthetic(
            m_plain, params, (1, size, size, 3), include_heads=args.ptq_heads,
        )
        print(json.dumps({"ptq_quantized_convs": n_q}), flush=True)

    # warm up the device->host fetch path once (first fetch pays ~45s handshake)
    x0 = jnp.zeros((), jnp.float32) + 1
    float(x0)

    results = []
    for bs in [int(b) for b in args.batches.split(",")]:
        rng = np.random.default_rng(0)
        if args.fused:
            fused = make_fused_predict_fn(
                apply_fn, anchors, image_size=size,
                nms_mode="merged_top2" if args.fast_decode else "merged",
            )
            canvas, sizes = pack_canvas(
                [rng.integers(0, 256, (480, 640, 3), np.uint8) for _ in range(bs)]
            )
            canvas, sizes = jnp.asarray(canvas), jnp.asarray(sizes)
            t = time_fn(lambda: fused(run_params, canvas, sizes),
                        lambda o: float(o.scores[0, 0]), iters=args.iters)
            r = {"variant": args.variant, "batch": bs,
                 "path": "fused_uint8_e2e" + ("_fast" if args.fast_decode else "")
                 + ("_int8ptq_heads" if args.ptq and args.ptq_heads
                    else "_int8ptq" if args.ptq else ""),
                 "ms": round(t * 1e3, 2), "img_s": round(bs / t, 1),
                 "ms_per_image": round(t * 1e3 / bs, 3)}
            results.append(r)
            print(json.dumps(r), flush=True)
            continue
        images = jnp.asarray(rng.uniform(0, 1, (bs, size, size, 3)).astype(np.float32))
        for name, model in stems:
            fwd = jax.jit(lambda p, x, m=model: m.apply(p, (x - 0.5) * 2.0))
            t_fwd = time_fn(lambda: fwd(params, images), lambda o: float(o[0][0, 0, 0]),
                            iters=args.iters)
            predict = make_predict_fn(model.apply, anchors)
            t_pred = time_fn(lambda: predict(params, images),
                             lambda o: float(o.scores[0, 0]), iters=args.iters)
            r = {"batch": bs, "stem": name,
                 "fwd_ms": round(t_fwd * 1e3, 2), "fwd_img_s": round(bs / t_fwd, 1),
                 "pred_ms": round(t_pred * 1e3, 2), "pred_img_s": round(bs / t_pred, 1)}
            results.append(r)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
