"""Train the REFERENCE-equivalent tf.keras stack for the mAP parity head-to-head.

BASELINE.json's gate is "mAP parity with reference", which needs a reference-side
number on data we can actually train on (no COCO in this environment, and the
reference publishes none). This harness trains the reference's architecture
(tools/measure_reference.build_reference_model — the exact conv stack of reference
models/ssd_model.py:74-171, weights=None since ImageNet weights cannot be
downloaded here) with the reference's training math:

  - MultiBox loss transliterated from reference models/ssd_model.py:341-396:
    positive CE mean, batch-global hard-negative top-k (k = 3*num_positive,
    background = LAST channel), plain-L1 loc loss, unweighted sum;
  - per-tensor clip_by_norm 0.01 (reference :248-249);
  - Adam + ExponentialDecay main phase after a PolynomialDecay warmup phase with a
    separate optimizer (reference :289-323, config/default.yml:17-42).

Faithfulness deviations, both documented and intentional:
  - the train step runs under tf.function (the reference is eager; compiling the
    identical math makes CPU training ~5x faster — this is an accuracy parity
    harness, not a speed measurement; eager speed is measured separately in
    tools/measure_reference.py);
  - target building (anchor matching + offset encoding) uses OUR on-device matcher,
    which is bit-compatible with the reference's host matcher (golden tests ported
    from reference tests/utils/test_bbox.py:25-45) — so BOTH stacks train on
    byte-identical inputs and targets, isolating the stack difference itself.

Evaluation pipes the tf model's raw (loc, conf) through OUR decode + NMS +
DetectionEvaluator with the same parameters tools/eval.py uses for our stack, so
the two mAP numbers differ only by the trained model.

Usage:
  JAX_PLATFORMS=cpu python tools/train_reference.py --root /tmp/parity_coco \
      --epochs 30 --batch-size 16 --warmup-steps 50 --out /tmp/ref_parity.json
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # jax is only used for targets/decode

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# drop the auto-added tools/ dir: tools/profile.py would shadow stdlib `profile`,
# which keras pulls in via IPython (cProfile does `import profile`)
sys.path[:] = [p for p in sys.path if os.path.abspath(p or ".") != os.path.join(_REPO, "tools")]

import numpy as np


def make_reference_loss(tf):
    """Reference _ssd_loss (models/ssd_model.py:341-396) as graph-compilable tf.

    The reference's eager runtime asserts and .numpy() logging (:347-351,:370,
    :388-394) are control/observability, not math, and are dropped so the fn can
    run under tf.function."""

    def ssd_loss(gt_cls, gt_box, gt_mask, pred_box, pred_cls):
        pos_f = tf.cast(gt_mask, tf.float32)
        num_pos = tf.reduce_sum(tf.cast(gt_mask, tf.int32))

        ce_pos = tf.nn.sparse_softmax_cross_entropy_with_logits(gt_cls, pred_cls)
        loss_cls_pos = tf.reduce_sum(ce_pos * pos_f) / tf.reduce_sum(pos_f)

        n_class = tf.shape(pred_cls)[-1]
        bg = tf.ones_like(gt_cls) * (n_class - 1)  # background = LAST channel
        ce_neg = tf.nn.sparse_softmax_cross_entropy_with_logits(bg, pred_cls)
        ce_neg = ce_neg * (1.0 - pos_f)  # negatives only
        # batch-GLOBAL top-k threshold at k = 3 * num_positive (reference :368-373)
        top_k, _ = tf.math.top_k(tf.reshape(ce_neg, (-1,)), num_pos * 3)
        neg_mask = tf.cast(ce_neg >= top_k[-1], tf.float32)
        loss_cls_neg = tf.reduce_sum(ce_neg * neg_mask) / tf.reduce_sum(neg_mask)

        # plain L1 (NOT smooth-L1), mean over positives (reference :383-386)
        l1 = tf.reduce_sum(tf.abs(pred_box - gt_box), axis=-1)
        loss_box = tf.reduce_sum(l1 * pos_f) / tf.reduce_sum(pos_f)
        return loss_box + loss_cls_pos + loss_cls_neg

    return ssd_loss


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, required=True, help="COCO-format dataset root")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--warmup-steps", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--max-gt", type=int, default=32)
    p.add_argument("--out", type=str, default="/tmp/ref_parity.json")
    p.add_argument("--save-weights", type=str, default="")
    p.add_argument(
        "--save-model", type=str, default="",
        help="whole-model .h5 save per epoch (the format models/import_keras."
             "load_reference_ssd_h5 reads, for the trained-weights parity check)")
    p.add_argument(
        "--jit-compile", action="store_true",
        help="XLA-compile the tf train step (identical math, faster on CPU; same "
             "class of documented deviation as tf.function itself)")
    args = p.parse_args()

    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")

    import jax  # CPU (env pin above)

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ssd_object_detection_tpu.data.coco import open_split
    from ssd_object_detection_tpu.data.pipeline import CocoPipeline, PipelineConfig
    from ssd_object_detection_tpu.eval.predict import detect_from_logits
    from ssd_object_detection_tpu.eval.runner import evaluate_batches
    from ssd_object_detection_tpu.ops.anchors import SSD300_SPEC, generate_anchors
    from ssd_object_detection_tpu.ops.matching import build_targets
    from tools.measure_reference import build_reference_model

    anchors = jnp.asarray(generate_anchors(SSD300_SPEC))
    model = build_reference_model()
    loss_fn = make_reference_loss(tf)

    # reference config/default.yml:17-39 schedule shapes
    main_sched = tf.keras.optimizers.schedules.ExponentialDecay(args.lr, 100, 0.99)
    warm_sched = tf.keras.optimizers.schedules.PolynomialDecay(1e-6, args.warmup_steps, args.lr)
    main_opt = tf.keras.optimizers.Adam(main_sched, epsilon=1e-7)
    warm_opt = tf.keras.optimizers.Adam(warm_sched, epsilon=1e-7)
    # build slot variables eagerly: keras-3 optimizers otherwise create them on
    # first apply_gradients, which tf.function forbids mid-trace
    main_opt.build(model.trainable_variables)
    warm_opt.build(model.trainable_variables)

    @tf.function(jit_compile=args.jit_compile)
    def train_step(opt, image, gt_cls, gt_box, gt_mask):
        with tf.GradientTape() as tape:
            pred_loc, pred_conf = model(image, training=True)
            loss = loss_fn(gt_cls, gt_box, gt_mask, pred_loc, pred_conf)
        grads = tape.gradient(loss, model.trainable_variables)
        # per-TENSOR clip to norm 0.01 (reference models/ssd_model.py:248-249)
        grads = [tf.clip_by_norm(g, 0.01) if g is not None else None for g in grads]
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    jit_targets = jax.jit(
        lambda c, b, v: build_targets(c, b, v, anchors), backend="cpu"
    )

    def make_pipeline(split, shuffle):
        index = open_split(args.root, split)
        return CocoPipeline(index, PipelineConfig(
            image_size=300, max_gt=args.max_gt, batch_size=args.batch_size,
            shuffle=shuffle, num_workers=4,
        ))

    # ONE pipeline for all of training: CocoPipeline reshuffles on every
    # iteration pass (persistent rng + epoch counter, data/pipeline.py) — the
    # same regime tools/train.py's arm gets. Rebuilding it per epoch would
    # replay one fixed batch order every epoch and bias the parity head-to-head.
    train_pipe = make_pipeline("train", shuffle=True)

    def to_ref_batch(batch):
        """Our pipeline batch -> (image [-1,1], targets) with OUR bit-compatible
        matcher; identical arrays feed our stack in the parity twin run."""
        t_cls, t_loc, t_mask = jit_targets(
            jnp.asarray(batch["gt_cls"]), jnp.asarray(batch["gt_boxes"]),
            jnp.asarray(batch["gt_valid"]),
        )
        image = np.asarray(batch["image"], np.float32)
        if batch["image"].dtype == np.uint8:  # pipeline emits uint8 (data/pipeline.py)
            image = image / 255.0
        image = (image - 0.5) * 2.0
        return (tf.constant(image), tf.constant(np.asarray(t_cls)),
                tf.constant(np.asarray(t_loc)), tf.constant(np.asarray(t_mask)))

    t0 = time.time()
    step = 0
    # warmup phase with the separate optimizer (reference :295-311)
    while step < args.warmup_steps:
        for batch in train_pipe:
            image, t_cls, t_loc, t_mask = to_ref_batch(batch)
            loss = train_step(warm_opt, image, t_cls, t_loc, t_mask)
            step += 1
            if step >= args.warmup_steps:
                break
    if args.warmup_steps > 0:
        print(f"warmup done ({args.warmup_steps} steps), loss={float(loss):.4f}",
              flush=True)

    for epoch in range(args.epochs):
        losses = []
        t_ep = time.time()
        for batch in train_pipe:
            image, t_cls, t_loc, t_mask = to_ref_batch(batch)
            losses.append(float(train_step(main_opt, image, t_cls, t_loc, t_mask)))
            if len(losses) % 50 == 0:
                # rate print every 50 steps: a multi-hour CPU run must be
                # monitorable long before the first 250-step epoch line
                print(f"  step {len(losses)}: loss={np.mean(losses[-50:]):.4f} "
                      f"({(time.time() - t_ep) / len(losses):.1f}s/step)", flush=True)
        print(f"epoch {epoch + 1}/{args.epochs}: loss={np.mean(losses):.4f} "
              f"({time.time() - t0:.0f}s elapsed)", flush=True)
        if args.save_model:
            # whole-model legacy .h5 per epoch: crash protection for a multi-hour
            # CPU run AND the artifact load_reference_ssd_h5 imports for the
            # trained-weights parity check (tools/parity_trained_equiv.py).
            # Also keep a per-epoch copy so a matched-step mAP curve can be built
            # (epoch N of batch-8 on 2,000 images = 250*N main-phase steps).
            try:
                model.save(args.save_model)
                ep_path = args.save_model.removesuffix(".h5") + f"_ep{epoch + 1}.h5"
                model.save(ep_path)
            except Exception as e:  # pragma: no cover
                print(f"model.save failed (continuing): {e}", flush=True)

    if args.save_weights:
        # Keras 3 requires the `.weights.h5` suffix; never let a save error throw
        # away a multi-hour CPU training run before the eval below (it did once:
        # round 3, 90 minutes)
        path = args.save_weights
        if not path.endswith(".weights.h5"):
            path = path.removesuffix(".h5") + ".weights.h5"
        try:
            model.save_weights(path)
        except Exception as e:  # pragma: no cover
            print(f"save_weights failed (continuing to eval): {e}", flush=True)

    # ---- evaluate through OUR decode + NMS + evaluator (same params as tools/eval.py)
    jit_decode = jax.jit(
        lambda loc, conf: detect_from_logits(loc, conf, anchors), backend="cpu"
    )

    def ref_predict(_params, images01):
        x = np.asarray(images01, np.float32)
        if images01.dtype == np.uint8:  # the pipeline emits uint8 (data/pipeline.py)
            x = x / 255.0
        x = (x - 0.5) * 2.0
        loc, conf = model(tf.constant(x), training=False)
        return jit_decode(jnp.asarray(loc.numpy()), jnp.asarray(conf.numpy()))

    metrics = evaluate_batches(
        ref_predict, None, make_pipeline("val", shuffle=False),
        num_classes=args.num_classes
    )
    result = {
        "stack": "reference-equivalent tf.keras (tools/measure_reference.build_reference_model)",
        "train": {"epochs": args.epochs, "batch_size": args.batch_size,
                  "warmup_steps": args.warmup_steps, "lr": args.lr,
                  "wall_minutes": round((time.time() - t0) / 60, 1)},
        "metrics": {k: round(float(v), 4) for k, v in metrics.items()},
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
