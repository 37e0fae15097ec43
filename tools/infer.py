"""CLI single/batch image inference: detect objects and render/save annotated output.

`python tools/infer.py config.yml --weights w.msgpack --images a.jpg b.jpg --out-dir out/`

New capability — the reference has no inference entry point at all (SURVEY.md
section 3.3); its closest analog is the interactive cv2 visualization inside training.
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description="run ssd detection on images")
    parser.add_argument("config", type=str)
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--images", type=str, nargs="+", required=True)
    parser.add_argument("--out-dir", type=str, default="detections")
    parser.add_argument("--score-thresh", type=float, default=0.3)
    parser.add_argument("--iou-thresh", type=float, default=0.45)
    parser.add_argument("--ptq", action="store_true",
                        help="int8-quantize the MXU-eligible convs (ops/quant.py), "
                        "calibrating on the input images themselves")
    parser.add_argument("--ptq-heads", action="store_true",
                        help="with --ptq: also quantize the loc/conf head convs")
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ssd_object_detection_tpu.config import load_config
    from ssd_object_detection_tpu.data.coco import COCO_NAMES, coco_colors
    from ssd_object_detection_tpu.eval.predict import make_predict_fn
    from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.utils.viz import draw_bbox

    cfg = load_config(args.config)
    spec = MODEL_SPECS[cfg.model.variant]
    size = spec.image_size
    model = SSD(num_classes=cfg.data.num_classes + 1, spec=spec,
                dtype=jnp.bfloat16 if cfg.model.precision == "bfloat16" else jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    if args.weights:
        with open(args.weights, "rb") as f:
            params = serialization.from_bytes(params, f.read())

    names = COCO_NAMES if cfg.data.dataset == "coco" else [
        f"class_{i}" for i in range(cfg.data.num_classes)
    ]
    colors = coco_colors()

    os.makedirs(args.out_dir, exist_ok=True)
    originals, batch = [], []
    for path in args.images:
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(path)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        originals.append(rgb)
        batch.append(cv2.resize(rgb, (size, size)).astype(np.float32) / 255.0)

    apply_fn, run_params = model.apply, params
    if args.ptq:
        from ssd_object_detection_tpu.ops.quant import quantize_ssd

        calib = [jnp.asarray((np.stack(batch) - 0.5) * 2.0)]  # model-input norm
        apply_fn, run_params = quantize_ssd(model, params, calib,
                                            include_heads=args.ptq_heads)
        logging.info("ptq: quantized %d convs", len(run_params["quant"]))

    predict = make_predict_fn(
        apply_fn, generate_anchors(spec.anchor_spec),
        variances=cfg.model.loss.variances,
        score_thresh=args.score_thresh, iou_thresh=args.iou_thresh,
    )
    det = predict(run_params, jnp.asarray(np.stack(batch)))
    results = []
    for i, path in enumerate(args.images):
        h, w = originals[i].shape[:2]
        valid = np.asarray(det.valid[i])
        boxes = np.asarray(det.boxes[i])[valid] * np.array([w, h, w, h], np.float32)
        scores = np.asarray(det.scores[i])[valid]
        classes = np.asarray(det.classes[i])[valid]
        rendered = draw_bbox(originals[i], boxes, classes, names, colors, scores=scores)
        out_path = os.path.join(args.out_dir, os.path.basename(path))
        cv2.imwrite(out_path, cv2.cvtColor(rendered, cv2.COLOR_RGB2BGR))
        results.append({
            "image": path, "output": out_path, "num_detections": int(valid.sum()),
            "detections": [
                {"class": names[int(c)], "score": round(float(s), 4),
                 "box_cxcywh": [round(float(v), 1) for v in b]}
                for c, s, b in zip(classes, scores, boxes)
            ],
        })
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
