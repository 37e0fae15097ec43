"""CLI: export a trained detector to a portable StableHLO serving artifact.

`python tools/export.py config.yml --weights w.msgpack --out detector.stablehlo \
    --batch-size 8 [--platforms tpu cpu]`

The artifact embeds the weights; serve it with:
    from ssd_object_detection_tpu.eval.serve import load_detector
    detect = load_detector(open("detector.stablehlo", "rb").read())
    detections = detect(images01)   # (B, S, S, 3) float32 in [0, 1]

`--fused` exports the fully-fused uint8 contract instead (on-device resize +
normalize + forward + NMS; host keeps only JPEG decode + pack_canvas):
    detections = detect(canvas_u8, sizes)  # (B, 3, Hc, Wc) uint8, (B, 2) int32
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def _calibration_batches(cfg, spec, n_batches, batch_size):
    """Model-input calibration batches ((x-0.5)*2-normalized) from the config's
    val split; synthetic data when the config uses the synthetic dataset."""
    import jax.numpy as jnp
    import numpy as np

    out = []
    if cfg.data.dataset == "synthetic":
        from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset

        ds = SyntheticDetectionDataset(
            num_images=n_batches * batch_size, image_size=spec.image_size,
            max_gt=min(cfg.data.max_gt, 8), num_classes=min(cfg.data.num_classes, 8),
        )
        for batch in ds.batches(batch_size=batch_size):
            img = np.asarray(batch["image"]).astype(np.float32)
            if np.asarray(batch["image"]).dtype == np.uint8:
                img = img / 255.0
            out.append(jnp.asarray((img - 0.5) * 2.0))
            if len(out) >= n_batches:
                break
    else:
        from ssd_object_detection_tpu.data.coco import open_split
        from ssd_object_detection_tpu.data.pipeline import CocoPipeline, PipelineConfig

        index = open_split(cfg.data.dataset_root, "val",
                           mini_batch=n_batches * batch_size)
        pipe = CocoPipeline(index, PipelineConfig(
            image_size=spec.image_size, max_gt=cfg.data.max_gt,
            batch_size=batch_size, shuffle=False, num_workers=cfg.data.num_workers,
        ))
        for batch in pipe:
            img = np.asarray(batch["image"]).astype(np.float32)
            if batch["image"].dtype == np.uint8:
                img = img / 255.0
            out.append(jnp.asarray((img - 0.5) * 2.0))
            if len(out) >= n_batches:
                break
    if not out:
        raise SystemExit("--ptq: no calibration batches available from the dataset")
    return out


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description="export ssd detector for serving")
    parser.add_argument("config", type=str)
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--platforms", type=str, nargs="*", default=None)
    parser.add_argument("--score-thresh", type=float, default=0.01)
    parser.add_argument("--fused", action="store_true",
                        help="fused uint8 contract: detect(canvas_u8, sizes)")
    parser.add_argument("--tiers", type=str, default=None,
                        help="with --fused: comma-separated batch tiers (e.g. "
                        "'1,4,8') to export as ONE multi-tier bundle; serving then "
                        "dispatches each request at the smallest tier that fits "
                        "(eval/serve.export_fused_detector_bundle). Overrides "
                        "--batch-size as the largest tier")
    parser.add_argument("--canvas", type=int, nargs=2, default=(640, 640),
                        metavar=("HC", "WC"), help="canvas extents for --fused")
    parser.add_argument("--ptq", action="store_true",
                        help="int8-quantize the MXU-eligible convs (ops/quant.py) "
                        "before export; calibrates on --calib-batches val batches "
                        "from the config's dataset")
    parser.add_argument("--calib-batches", type=int, default=4)
    parser.add_argument("--ptq-heads", action="store_true",
                        help="with --ptq: also quantize the loc/conf head convs "
                        "(~9%% faster at batch 32; accuracy gate "
                        "EVAL_SYNTHETIC_PTQ.json ptq_heads)")
    args = parser.parse_args()
    if args.tiers and not args.fused:
        parser.error("--tiers requires --fused (bundles hold fused artifacts)")

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ssd_object_detection_tpu.config import load_config
    from ssd_object_detection_tpu.eval.serve import export_detector, export_fused_detector
    from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD
    from ssd_object_detection_tpu.ops.anchors import generate_anchors

    cfg = load_config(args.config)
    spec = MODEL_SPECS[cfg.model.variant]
    model = SSD(num_classes=cfg.data.num_classes + 1, spec=spec,
                dtype=jnp.bfloat16 if cfg.model.precision == "bfloat16" else jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, spec.image_size, spec.image_size, 3)))
    if args.weights:
        with open(args.weights, "rb") as f:
            params = serialization.from_bytes(params, f.read())

    apply_fn, export_params = model.apply, params
    if args.ptq:
        from ssd_object_detection_tpu.ops.quant import quantize_ssd

        calib = _calibration_batches(cfg, spec, args.calib_batches, args.batch_size)
        apply_fn, export_params = quantize_ssd(model, params, calib,
                                               include_heads=args.ptq_heads)
        logging.info("ptq: quantized %d convs: %s",
                     len(export_params["quant"]), sorted(export_params["quant"]))

    common = dict(
        batch_size=args.batch_size, image_size=spec.image_size,
        variances=cfg.model.loss.variances,
        platforms=tuple(args.platforms) if args.platforms else None,
        score_thresh=args.score_thresh,
    )
    if args.fused and args.tiers:
        from ssd_object_detection_tpu.eval.serve import export_fused_detector_bundle

        tiers = [int(t) for t in args.tiers.split(",") if t]
        common.pop("batch_size")
        blob = export_fused_detector_bundle(
            apply_fn, export_params, generate_anchors(spec.anchor_spec),
            batch_tiers=tiers, canvas_hw=tuple(args.canvas), **common,
        )
    elif args.fused:
        blob = export_fused_detector(
            apply_fn, export_params, generate_anchors(spec.anchor_spec),
            canvas_hw=tuple(args.canvas), **common,
        )
    else:
        blob = export_detector(
            apply_fn, export_params, generate_anchors(spec.anchor_spec), **common,
        )
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
