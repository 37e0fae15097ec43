"""CLI profiler: capture an XPlane trace of inference or a train step.

`python tools/profile.py config.yml --mode infer|infer-fused|train --out /tmp/xprof --steps 3`
(`--mode infer-fused --ptq [--ptq-heads]` traces the int8 serving headline path)

View with TensorBoard's profile plugin / xprof, or summarize per-op device time:
`python tools/profile.py ... --summarize` parses the trace.json.gz directly.

Replaces-and-exceeds the reference's one-shot graph trace (models/ssd_model.py:65-72):
this captures actual per-fusion device timing.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def summarize(trace_dir: str, top: int = 20):
    path = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))[-1]
    with gzip.open(path) as f:
        trace = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "") for e in trace["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n or "device" in n.lower()}
    agg = collections.Counter()
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and e.get("dur", 0) > 0 and e["pid"] in device_pids:
            agg[e["name"][:64]] += e["dur"]
    print(f"{'device time (ms)':>18}  op")
    for name, dur in agg.most_common(top):
        print(f"{dur / 1000:18.3f}  {name}")


def main():
    parser = argparse.ArgumentParser(description="profile ssd inference or training")
    parser.add_argument("config", type=str)
    parser.add_argument("--mode", choices=("infer", "infer-fused", "train"), default="infer")
    parser.add_argument("--out", type=str, default="/tmp/ssd_xprof")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--summarize", action="store_true")
    parser.add_argument("--ptq", action="store_true",
                        help="with --mode infer-fused: trace the int8 serving path "
                        "(ops/quant.py; abstract-trace eligibility + synthetic "
                        "scales — per-op timing is scale-independent)")
    parser.add_argument("--ptq-heads", action="store_true",
                        help="with --ptq: also quantize the loc/conf head convs "
                        "(+9%% measured on VGG; accuracy gate "
                        "EVAL_SYNTHETIC_PTQ.json ptq_heads)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssd_object_detection_tpu.config import load_config
    from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.utils.introspect import trace

    cfg = load_config(args.config)
    spec = MODEL_SPECS[cfg.model.variant]
    size = spec.image_size
    model = SSD(num_classes=cfg.data.num_classes + 1, spec=spec,
                dtype=jnp.bfloat16 if cfg.model.precision == "bfloat16" else jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    anchors = generate_anchors(spec.anchor_spec)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (args.batch_size, size, size, 3)).astype(np.float32))

    if args.mode == "infer":
        from ssd_object_detection_tpu.eval.predict import make_predict_fn

        predict = make_predict_fn(model.apply, anchors)
        out = predict(params, images)
        float(out.scores.ravel()[0])  # warmup + sync
        with trace(args.out):
            for _ in range(args.steps):
                out = predict(params, images)
            float(out.scores.ravel()[0])
    elif args.mode == "infer-fused":
        # the bench.py headline path: uint8 canvas -> resize -> ... -> NMS, one jit
        from ssd_object_detection_tpu.eval.predict import make_fused_predict_fn
        from ssd_object_detection_tpu.ops.preprocess import pack_canvas

        # Match bench.py's headline serving config exactly: bf16 conf logits
        # through ranking (conf_f32=False; params are layout-identical) and
        # merged_top2 NMS — otherwise per-op conclusions describe a program the
        # serving path no longer runs.
        model = SSD(num_classes=cfg.data.num_classes + 1, spec=spec,
                    dtype=jnp.bfloat16 if cfg.model.precision == "bfloat16" else jnp.float32,
                    conf_f32=False)
        apply_fn, run_params = model.apply, params
        if args.ptq:
            from ssd_object_detection_tpu.ops.quant import quantize_synthetic

            apply_fn, run_params, n_q = quantize_synthetic(
                model, params, (args.batch_size, size, size, 3),
                include_heads=args.ptq_heads,
            )
            print(f"ptq: {n_q} convs int8", flush=True)

        predict = make_fused_predict_fn(apply_fn, anchors, image_size=size,
                                        nms_mode="merged_top2")
        canvas, sizes = pack_canvas(
            [rng.integers(0, 256, (480, 640, 3), np.uint8)
             for _ in range(args.batch_size)]
        )
        canvas, sizes = jnp.asarray(canvas), jnp.asarray(sizes)
        out = predict(run_params, canvas, sizes)
        float(out.scores.ravel()[0])  # warmup + sync
        with trace(args.out):
            for _ in range(args.steps):
                out = predict(run_params, canvas, sizes)
            float(out.scores.ravel()[0])
    else:
        from ssd_object_detection_tpu.train.optim import make_optimizer
        from ssd_object_detection_tpu.train.step import (
            StepConfig, create_train_state, make_train_step,
        )

        tx = make_optimizer("adam", 1e-3)
        step_fn = make_train_step(model.apply, anchors, tx, StepConfig())
        state = create_train_state(params, tx)
        batch = {
            "image": images,
            "gt_cls": jnp.asarray(rng.integers(0, 80, (args.batch_size, cfg.data.max_gt)).astype(np.int32)),
            "gt_boxes": jnp.asarray(np.concatenate(
                [rng.uniform(0.2, 0.8, (args.batch_size, cfg.data.max_gt, 2)),
                 rng.uniform(0.05, 0.4, (args.batch_size, cfg.data.max_gt, 2))], -1).astype(np.float32)),
            "gt_valid": jnp.asarray(rng.uniform(size=(args.batch_size, cfg.data.max_gt)) < 0.15),
        }
        state, m = step_fn(state, batch)
        float(m["loss"])
        with trace(args.out):
            for _ in range(args.steps):
                state, m = step_fn(state, batch)
            float(m["loss"])

    print(f"trace written to {args.out}")
    if args.summarize:
        summarize(args.out)


if __name__ == "__main__":
    main()
