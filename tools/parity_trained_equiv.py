"""Trained-weights end-to-end parity check (PARITY v2, leg b).

The round-3 head-to-head compared two models trained separately — random-init
activation parity was tested, but nobody ever showed that a model the REFERENCE
stack actually trained produces the same detections when run through OUR stack.
This harness closes that: it imports the reference arm's TRAINED whole-model .h5
(written by tools/train_reference.py --save-model; same save format as reference
models/ssd_model.py:405-411) into our flax SSD300 via
models/import_keras.load_reference_ssd_h5, then evaluates BOTH forwards —
tf.keras and ours — through the IDENTICAL decode + NMS + DetectionEvaluator on
the same val split. Identical mAP rows mean the two runtimes compute the same
trained function end-to-end, not just at random init.

Usage:
  JAX_PLATFORMS=cpu python tools/parity_trained_equiv.py \
      --root /tmp/parity_coco_mid --h5 /tmp/ref_parity_mid.h5 \
      --out PARITY_TRAINED_EQUIV.json
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # f32 CPU on both arms: exactness

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path[:] = [p for p in sys.path if os.path.abspath(p or ".") != os.path.join(_REPO, "tools")]

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, required=True, help="COCO-format dataset root")
    p.add_argument("--h5", type=str, required=True,
                   help="whole-model .h5 from tools/train_reference.py --save-model")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-gt", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--out", type=str, default="PARITY_TRAINED_EQUIV.json")
    args = p.parse_args()

    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ssd_object_detection_tpu.data.coco import open_split
    from ssd_object_detection_tpu.data.pipeline import CocoPipeline, PipelineConfig
    from ssd_object_detection_tpu.eval.predict import detect_from_logits, make_predict_fn
    from ssd_object_detection_tpu.eval.runner import evaluate_batches
    from ssd_object_detection_tpu.models.import_keras import load_reference_ssd_h5
    from ssd_object_detection_tpu.models.ssd import SSD, SSD300_SPEC_MODEL
    from ssd_object_detection_tpu.ops.anchors import SSD300_SPEC, generate_anchors

    anchors = jnp.asarray(generate_anchors(SSD300_SPEC))

    # ---- arm 1: the trained tf.keras model itself
    keras_model = tf.keras.models.load_model(args.h5, compile=False)
    jit_decode = jax.jit(
        lambda loc, conf: detect_from_logits(loc, conf, anchors), backend="cpu"
    )

    def tf_predict(_params, images01):
        x = np.asarray(images01, np.float32)
        if images01.dtype == np.uint8:
            x = x / 255.0
        x = (x - 0.5) * 2.0
        loc, conf = keras_model(tf.constant(x), training=False)
        return jit_decode(jnp.asarray(loc.numpy()), jnp.asarray(conf.numpy()))

    # ---- arm 2: the SAME trained weights imported into OUR flax model (f32)
    model = SSD(num_classes=args.num_classes + 1, spec=SSD300_SPEC_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3), jnp.float32))
    loaded = load_reference_ssd_h5(params, args.h5)
    ours_predict = make_predict_fn(model.apply, anchors)

    def make_pipeline():
        index = open_split(args.root, "val")
        return CocoPipeline(index, PipelineConfig(
            image_size=300, max_gt=args.max_gt, batch_size=args.batch_size,
            shuffle=False, num_workers=2,
        ))

    # raw-activation diff on one fixed batch (sanity anchor for the mAP rows)
    batch0 = next(iter(make_pipeline()))
    x0 = np.asarray(batch0["image"], np.float32)
    if batch0["image"].dtype == np.uint8:
        x0 = x0 / 255.0
    xn = (x0 - 0.5) * 2.0
    loc_k, conf_k = keras_model(tf.constant(xn), training=False)
    loc_j, conf_j = model.apply(loaded, jnp.asarray(xn))
    act = {
        "loc_max_abs_diff": float(np.max(np.abs(np.asarray(loc_j) - loc_k.numpy()))),
        "conf_max_abs_diff": float(np.max(np.abs(np.asarray(conf_j) - conf_k.numpy()))),
    }
    print(f"activation diff on fixed batch: {act}", flush=True)

    t0 = time.time()
    tf_metrics = evaluate_batches(tf_predict, None, make_pipeline(),
                                  num_classes=args.num_classes)
    t1 = time.time()
    ours_metrics = evaluate_batches(ours_predict, loaded, make_pipeline(),
                                    num_classes=args.num_classes)
    t2 = time.time()

    keys = ("mAP", "mAP@0.5", "mAP@0.75", "AR@100")
    deltas = {k: round(float(ours_metrics[k]) - float(tf_metrics[k]), 6) for k in keys}
    ok = all(abs(d) <= 2e-3 for d in deltas.values())
    result = {
        "what": ("trained-weights end-to-end parity: the reference arm's TRAINED .h5 "
                 "imported into OUR flax SSD300 (models/import_keras.load_reference_ssd_h5) "
                 "must score the same mAP as the tf.keras forward, same val split, "
                 "identical decode+NMS+evaluator (f32, CPU, both arms)"),
        "h5": args.h5,
        "val_root": args.root,
        "activation_diff_fixed_batch": act,
        "tf_keras_forward": {k: round(float(v), 4) for k, v in tf_metrics.items()},
        "ours_imported_forward": {k: round(float(v), 4) for k, v in ours_metrics.items()},
        "deltas_ours_minus_tf": deltas,
        "gate": "|delta| <= 2e-3 on mAP, mAP@0.5, mAP@0.75, AR@100",
        "pass": bool(ok),
        "eval_wall_s": {"tf": round(t1 - t0, 1), "ours": round(t2 - t1, 1)},
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
