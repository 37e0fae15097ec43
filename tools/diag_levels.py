"""Per-pyramid-level diagnosis for a trained SSD variant (VERDICT round-4 item 1b).

The SSD512 convergence gate plateaus at mAP@0.5 0.844 with mAP@0.75 0.247 (vs
~0.83-0.92 for every 300-family variant on the same synthetic data). This tool
answers WHERE the precision is lost, per feature-map tap:

  1. anchor ceiling    — max IoU of the raw anchor grid vs each GT, per level
                         (what matching geometry allows before any learning);
  2. regressor quality — IoU of the decoded box AT the anchor the matcher
                         actually assigns each GT to (phase-1/phase-2, exactly
                         the training assignment) — isolates the loc head;
  3. classifier choice — per-level max IoU over decoded boxes whose predicted
                         class prob (for the GT class) clears a threshold —
                         does the conf head fire on the well-localized anchors?
  4. per-level AP      — full predict path with every OTHER level's logits
                         masked to background, through DetectionEvaluator.

Reference context: the reference has no 512 model and no per-level tooling at
all (its one decode is models/ssd_model.py:477-490); this is above-reference
diagnostics for our 512 family.

Usage:
  python tools/diag_levels.py --variant ssd512 --weights /tmp/ssd512_w.msgpack \
      --out DIAG_SSD512_LEVELS.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", type=str, default="ssd512")
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--num-val", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=8)
    p.add_argument("--max-gt", type=int, default=8)
    p.add_argument("--cls-thresh", type=float, default=0.3)
    p.add_argument("--out", type=str, default="DIAG_LEVELS.json")
    args = p.parse_args()

    from flax import serialization

    from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset
    from ssd_object_detection_tpu.eval.coco_map import DetectionEvaluator
    from ssd_object_detection_tpu.eval.predict import detect_from_logits
    from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD
    from ssd_object_detection_tpu.ops import boxes as box_ops
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.ops.matching import match_anchors

    spec = MODEL_SPECS[args.variant]
    img = spec.image_size
    aspec = spec.anchor_spec
    model = SSD(num_classes=args.num_classes + 1, spec=spec, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)))
    with open(args.weights, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    anchors = jnp.asarray(generate_anchors(aspec))

    # level boundaries in the flat anchor axis
    counts = [h * w * n for (h, w), n in zip(aspec.feature_sizes, aspec.anchors_per_cell)]
    bounds = np.concatenate([[0], np.cumsum(counts)])
    n_levels = len(counts)
    print(f"{args.variant}: {n_levels} levels, anchors per level {counts}", flush=True)

    val_ds = SyntheticDetectionDataset(
        num_images=args.num_val, image_size=img, max_gt=args.max_gt,
        num_classes=args.num_classes, seed=999,
    )
    samples = [val_ds.sample(i) for i in range(args.num_val)]
    images = jnp.asarray(np.stack([s[0] for s in samples]))
    gt_cls = np.stack([s[1] for s in samples])
    gt_boxes = np.stack([s[2] for s in samples])
    gt_valid = np.stack([s[3] for s in samples])

    @jax.jit
    def forward(params, imgs):
        loc, logits = model.apply(params, (imgs - 0.5) * 2.0)
        boxes = box_ops.decode_boxes(loc, anchors[None], variances=None)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :-1]
        return loc, logits, boxes, probs

    @jax.jit
    def assign(gc, gb, gv):
        return match_anchors(gc, gb, gv, anchors).gt_index

    bs = args.batch_size
    all_boxes, all_probs, all_logits, all_loc = [], [], [], []
    for b0 in range(0, args.num_val, bs):
        loc, logits, boxes, probs = forward(params, images[b0 : b0 + bs])
        all_boxes.append(np.asarray(boxes, np.float32))
        all_probs.append(np.asarray(probs, np.float32))
        all_logits.append(np.asarray(logits, np.float32))
        all_loc.append(np.asarray(loc, np.float32))
    dec_boxes = np.concatenate(all_boxes)   # (N, D, 4) cxcywh
    probs = np.concatenate(all_probs)       # (N, D, C)
    logits = np.concatenate(all_logits)     # (N, D, C+1)
    anchors_np = np.asarray(anchors)

    def iou_1_many(g, boxes_cxcywh):
        gx = np.asarray(box_ops.cxcywh_to_xyxy(g[None]))[0]
        bx = np.asarray(box_ops.cxcywh_to_xyxy(boxes_cxcywh))
        x0 = np.maximum(gx[0], bx[:, 0]); y0 = np.maximum(gx[1], bx[:, 1])
        x1 = np.minimum(gx[2], bx[:, 2]); y1 = np.minimum(gx[3], bx[:, 3])
        inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
        area_g = (gx[2] - gx[0]) * (gx[3] - gx[1])
        area_b = np.clip(bx[:, 2] - bx[:, 0], 0, None) * np.clip(bx[:, 3] - bx[:, 1], 0, None)
        return inter / np.maximum(area_g + area_b - inter, 1e-10)

    # --- passes 1-3: per-GT, per-level IoU stats -----------------------------
    anchor_ceiling = [[] for _ in range(n_levels)]
    regressor_iou = [[] for _ in range(n_levels)]       # at the training-assigned anchor
    classifier_iou = [[] for _ in range(n_levels)]      # best decoded box with prob>=t
    assigned_level_hist = np.zeros(n_levels, np.int64)  # where matcher puts GTs
    best_pred_level_hist = np.zeros(n_levels, np.int64)

    for i in range(args.num_val):
        # training assignment: anchor -> gt index (>=0) via the real matcher
        matched_gt = np.asarray(
            assign(jnp.asarray(gt_cls[i]), jnp.asarray(gt_boxes[i]),
                   jnp.asarray(gt_valid[i]))
        )
        for j in range(args.max_gt):
            if not gt_valid[i, j]:
                continue
            g = gt_boxes[i, j]
            iou_anch = iou_1_many(g, anchors_np)          # (D,)
            iou_dec = iou_1_many(g, dec_boxes[i])         # (D,)
            cls_mask = probs[i, :, gt_cls[i, j]] >= args.cls_thresh
            own_anchors = matched_gt == j                 # this GT's assigned anchors
            best_overall = -1.0
            best_overall_level = 0
            for lv in range(n_levels):
                s, e = bounds[lv], bounds[lv + 1]
                anchor_ceiling[lv].append(float(iou_anch[s:e].max()))
                cm = cls_mask[s:e]
                classifier_iou[lv].append(
                    float(iou_dec[s:e][cm].max()) if cm.any() else 0.0
                )
                om = own_anchors[s:e]
                if om.any():
                    lv_best = float(iou_dec[s:e][om].max())
                    regressor_iou[lv].append(lv_best)
                    assigned_level_hist[lv] += int(om.sum())
                if iou_dec[s:e].max() > best_overall:
                    best_overall = float(iou_dec[s:e].max())
                    best_overall_level = lv
            best_pred_level_hist[best_overall_level] += 1

    # --- pass 4: per-level AP (mask other levels' logits to background-only) --
    jit_detect = jax.jit(
        lambda lc, lg: detect_from_logits(lc, lg, anchors, score_thresh=0.05)
    )
    loc_all = np.concatenate(all_loc)
    per_level_ap = []
    scale = np.array([float(img)] * 4, np.float32)
    for lv in range(n_levels):
        mask = np.full((bounds[-1],), -1e9, np.float32)
        mask[bounds[lv] : bounds[lv + 1]] = 0.0
        evaluator = DetectionEvaluator(num_classes=args.num_classes)
        for b0 in range(0, args.num_val, bs):
            n = min(bs, args.num_val - b0)
            lg = logits[b0 : b0 + n].copy()
            lg[..., :-1] += mask[None, :, None]  # foreground classes only
            det = jit_detect(jnp.asarray(loc_all[b0 : b0 + n]), jnp.asarray(lg))
            for b in range(n):
                keep = np.asarray(det.valid[b])
                d_xyxy = np.asarray(box_ops.cxcywh_to_xyxy(det.boxes[b][keep] * scale))
                gv = gt_valid[b0 + b]
                g_xyxy = np.asarray(box_ops.cxcywh_to_xyxy(gt_boxes[b0 + b][gv] * scale))
                evaluator.add_image(
                    det_boxes=d_xyxy, det_scores=np.asarray(det.scores[b])[keep],
                    det_classes=np.asarray(det.classes[b])[keep],
                    gt_boxes=g_xyxy, gt_classes=gt_cls[b0 + b][gv],
                )
        m = evaluator.summarize()
        per_level_ap.append({"mAP@0.5": round(float(m["mAP@0.5"]), 4),
                             "mAP@0.75": round(float(m["mAP@0.75"]), 4),
                             "AR@100": round(float(m["AR@100"]), 4)})
        print(f"level {lv}: solo mAP@0.5 {per_level_ap[-1]['mAP@0.5']}, "
              f"mAP@0.75 {per_level_ap[-1]['mAP@0.75']}", flush=True)

    def stats(lst_per_level):
        return [
            {"n": len(v), "mean": round(float(np.mean(v)), 4) if v else None,
             "p50": round(float(np.median(v)), 4) if v else None,
             "frac>=0.75": round(float(np.mean(np.asarray(v) >= 0.75)), 4) if v else None}
            for v in lst_per_level
        ]

    out = {
        "variant": args.variant,
        "weights": args.weights,
        "val_images": args.num_val,
        "anchors_per_level": [int(c) for c in counts],
        "feature_sizes": [list(fs) for fs in aspec.feature_sizes],
        "scale_refs_rel": [round(s / img, 4) for s in aspec.scale_refs],
        "anchor_ceiling_iou": stats(anchor_ceiling),
        "regressor_iou_at_assigned_anchor": stats(regressor_iou),
        "classifier_best_iou_above_thresh": stats(classifier_iou),
        "cls_thresh": args.cls_thresh,
        "assigned_anchor_level_hist": assigned_level_hist.tolist(),
        "best_decoded_level_hist": best_pred_level_hist.tolist(),
        "per_level_solo_ap": per_level_ap,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
