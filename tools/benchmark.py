"""Benchmark suite: fills BASELINE.md's to-measure list (SURVEY.md section 6).

Usage: python tools/benchmark.py [--variant ssd300|ssd512] [--configs 1,2,3]

Configs (BASELINE.json):
  infer_b1    single-image forward + NMS decode        (config #1 analog)
  infer_b32   batched inference, batch 32              (config #2)
  train_step  single-device train step incl. matching + mining + loss (config #3)
  train_accum train step with 8x gradient accumulation (reference split_train)

Timing methodology for the axon-tunneled TPU: `jax.block_until_ready` does not
synchronize through the tunnel, so each measurement dispatches N iterations with a
data dependency chain and divides the end-to-end wall time (incl. one final sync) by N.
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


def _sync(out):
    """True device sync: fetch ONE scalar (block_until_ready doesn't block on axon,
    and device_get of a whole array pays tunnel bandwidth)."""
    leaf = jax.tree.leaves(out)[0]
    float(leaf.ravel()[0])


def timed_loop(fn, n_iters: int, *args):
    """Wall time per iteration over a dispatch loop with a final device sync."""
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n_iters


def main():
    from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD

    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="ssd300", choices=tuple(MODEL_SPECS))
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--skip-train", action="store_true")
    args = parser.parse_args()

    from ssd_object_detection_tpu.eval.predict import make_predict_fn
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.train.optim import make_optimizer
    from ssd_object_detection_tpu.train.step import StepConfig, create_train_state, make_train_step

    spec = MODEL_SPECS[args.variant]
    size = spec.image_size
    model = SSD(num_classes=81, spec=spec, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    anchors = generate_anchors(spec.anchor_spec)
    predict = make_predict_fn(model.apply, anchors)

    rng = np.random.default_rng(0)
    results = {}

    for name, batch_size in (("infer_b1", 1), ("infer_b32", 32)):
        images = jnp.asarray(rng.uniform(0, 1, (batch_size, size, size, 3)).astype(np.float32))
        dt = timed_loop(lambda x: predict(params, x), args.iters, images)
        results[name] = {"ms_per_batch": round(dt * 1000, 3), "images_per_sec": round(batch_size / dt, 1)}

    # BASELINE config #2 as written: uint8 in, on-device resize+normalize+forward+NMS
    from ssd_object_detection_tpu.eval.predict import make_fused_predict_fn
    from ssd_object_detection_tpu.ops.preprocess import pack_canvas

    canvas, sizes = pack_canvas(
        [rng.integers(0, 256, (480, 640, 3), np.uint8) for _ in range(32)]
    )
    canvas, sizes = jnp.asarray(canvas), jnp.asarray(sizes)
    fused = make_fused_predict_fn(model.apply, anchors, image_size=size)
    dt = timed_loop(lambda c, s: fused(params, c, s), args.iters, canvas, sizes)
    results["infer_fused_e2e_b32"] = {
        "ms_per_batch": round(dt * 1000, 3), "images_per_sec": round(32 / dt, 1),
    }

    if not args.skip_train:
        for name, accum in (("train_step_b32", 1), ("train_accum_8x", 8)):
            tx = make_optimizer("adam", 1e-3)
            step_fn = make_train_step(model.apply, anchors, tx, StepConfig(accum_steps=accum))
            state = create_train_state(params, tx)
            batch = {
                "image": jnp.asarray(rng.uniform(0, 1, (32, size, size, 3)).astype(np.float32)),
                "gt_cls": jnp.asarray(rng.integers(0, 80, (32, 100)).astype(np.int32)),
                "gt_boxes": jnp.asarray(np.concatenate(
                    [rng.uniform(0.2, 0.8, (32, 100, 2)), rng.uniform(0.05, 0.4, (32, 100, 2))], -1
                ).astype(np.float32)),
                "gt_valid": jnp.asarray(rng.uniform(size=(32, 100)) < 0.15),  # ~15 objects (COCO-like) at production max_gt=100 padding
            }

            def run(state=state, batch=batch, step_fn=step_fn):
                new_state, metrics = step_fn(state, batch)
                return metrics["loss"]

            dt = timed_loop(run, max(args.iters // 3, 5))
            results[name] = {"ms_per_step": round(dt * 1000, 3), "images_per_sec": round(32 / dt, 1)}

    print(json.dumps({"variant": args.variant, "device": str(jax.devices()[0]), **results}, indent=2))


if __name__ == "__main__":
    main()
