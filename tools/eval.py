"""CLI evaluator: `python tools/eval.py config.yml --weights run/model_last.msgpack`.

Computes COCO-style mAP over the validation split with the jitted
forward+decode+NMS path. New capability vs the reference (which has no evaluation).
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description="evaluate ssd model (COCO-style mAP)")
    parser.add_argument("config", type=str, help="yaml config file")
    parser.add_argument("--weights", type=str, default=None, help="msgpack params export")
    parser.add_argument("--max-batches", type=int, default=None)
    parser.add_argument("--score-thresh", type=float, default=0.01)
    parser.add_argument("--iou-thresh", type=float, default=0.45)
    parser.add_argument(
        "--data-parallel", type=int, default=0, metavar="N",
        help="shard inference over the first N local devices (0 = single device); "
        "batch_size should be a multiple of N",
    )
    parser.add_argument(
        "--ptq", action="store_true",
        help="evaluate through the int8 serving path (ops/quant.py), calibrating "
        "on --calib-batches val batches — measures the deployment mAP",
    )
    parser.add_argument("--calib-batches", type=int, default=4)
    parser.add_argument("--ptq-heads", action="store_true",
                        help="with --ptq: also quantize the loc/conf head convs")
    args = parser.parse_args()

    from flax import serialization

    from ssd_object_detection_tpu.config import load_config
    from ssd_object_detection_tpu.data.coco import open_split
    from ssd_object_detection_tpu.data.pipeline import CocoPipeline, PipelineConfig
    from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset
    from ssd_object_detection_tpu.eval.predict import make_predict_fn
    from ssd_object_detection_tpu.eval.runner import evaluate_batches
    from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD
    from ssd_object_detection_tpu.ops.anchors import generate_anchors

    cfg = load_config(args.config)
    # single source for the eval batch size (validated against --data-parallel
    # below and used to build the pipeline)
    eval_batch_size = 8 if cfg.data.dataset == "synthetic" else cfg.model.train.batch_size

    # validate --data-parallel BEFORE the (slow) model build so misuse fails fast
    mesh = None
    if args.data_parallel > 1:
        from ssd_object_detection_tpu.parallel.mesh import make_mesh

        n = args.data_parallel
        if n > len(jax.devices()):
            raise SystemExit(
                f"--data-parallel {n}: only {len(jax.devices())} devices available"
            )
        if eval_batch_size % n:
            raise SystemExit(
                f"--data-parallel {n}: batch size {eval_batch_size} is not "
                f"divisible by {n}, every batch would fall back to replicated "
                f"single-program execution"
            )
        mesh = make_mesh(n)

    spec = MODEL_SPECS[cfg.model.variant]
    num_classes = cfg.data.num_classes + 1
    dtype = jnp.bfloat16 if cfg.model.precision == "bfloat16" else jnp.float32
    model = SSD(num_classes=num_classes, spec=spec, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, spec.image_size, spec.image_size, 3)))
    if args.weights:
        with open(args.weights, "rb") as f:
            params = serialization.from_bytes(params, f.read())

    apply_fn, run_params = model.apply, params
    if args.ptq:
        from tools.export import _calibration_batches

        from ssd_object_detection_tpu.ops.quant import quantize_ssd

        calib = _calibration_batches(cfg, spec, args.calib_batches,
                                     cfg.model.train.batch_size)
        apply_fn, run_params = quantize_ssd(model, params, calib,
                                            include_heads=args.ptq_heads)
        logging.info("ptq: quantized %d convs", len(run_params["quant"]))
    params = run_params

    predict = make_predict_fn(
        apply_fn,
        generate_anchors(spec.anchor_spec),
        variances=cfg.model.loss.variances,
        iou_thresh=args.iou_thresh,
        score_thresh=args.score_thresh,
    )

    if cfg.data.dataset == "synthetic":
        ds = SyntheticDetectionDataset(
            num_images=cfg.data.mini_batch.num_data if cfg.data.mini_batch.enable else 64,
            image_size=spec.image_size,
            max_gt=min(cfg.data.max_gt, 8),
            num_classes=min(cfg.data.num_classes, 8),
        )
        batches = ds.batches(batch_size=eval_batch_size)
    else:
        index = open_split(
            cfg.data.dataset_root, "val",
            mini_batch=cfg.data.mini_batch.num_data if cfg.data.mini_batch.enable else 0,
        )
        batches = CocoPipeline(
            index,
            PipelineConfig(
                image_size=spec.image_size,
                max_gt=cfg.data.max_gt,
                batch_size=eval_batch_size,
                shuffle=False,
                num_workers=cfg.data.num_workers,
            ),
        )

    metrics = evaluate_batches(
        predict, params, batches, num_classes=cfg.data.num_classes,
        max_batches=args.max_batches, mesh=mesh,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
