"""Generate an on-disk COCO-format dataset of synthetic images for integration runs.

Writes the reference's expected layout (reference data_loaders/coco/README.md /
make_dataset.py): `<root>/annotations/instances_{train,val}2017.json` +
`<root>/{train,val}2017/*.jpg`, with REAL-COCO quirks baked in so the full
pipeline is exercised the way val2017 would exercise it:
  - sparse category ids (the real 90-id space with gaps) remapped by data/coco.py;
  - iscrowd annotations (a fraction of boxes) flowing into gt_crowd at eval;
  - a few images with zero annotations (skipped by the pipeline, reference parity);
  - mixed image sizes up to 640 px and a couple of grayscale JPEGs.

Usage: python tools/make_fake_coco.py --root /tmp/fake_coco --train 512 --val 128
Then:  point data.dataset_root at it and run tools/train.py / tools/eval.py.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# the real COCO-2017 sparse id space: 80 ids in [1, 90] with gaps
SPARSE_IDS = [i for i in range(1, 91) if i not in
              (12, 26, 29, 30, 45, 66, 68, 69, 71, 83)]


def _draw_shape_class(img, x, y, bw, bh, idx: int, rng, cv2) -> None:
    """Draw class `idx` (0-79) as SHAPE x STRIPE-PATTERN geometry in a random
    bright color: 10 base shapes x (0-3 stripes x {horizontal, vertical}).

    Color carries ZERO class information here — class identity survives
    photometric jitter (hue/brightness/contrast) by construction, so the full
    augmentation recipe (data/augment.py) gets a test it can in principle win
    (round-3 VERDICT weak-item 7: the color-coded mode is structurally hostile to
    photometric augmentation)."""
    x0, y0, x1, y1 = int(x), int(y), int(x + bw), int(y + bh)
    cx, cy = (x0 + x1) // 2, (y0 + y1) // 2
    # random bright fill + contrasting stripe color (complement keeps contrast
    # under hue rotation)
    fill = tuple(int(c) for c in rng.integers(140, 256, 3))
    stripe_col = tuple(255 - c for c in fill)
    shape, pattern = idx % 10, idx // 10
    n_stripes, vertical = pattern % 4, pattern >= 4

    t = max(2, min(x1 - x0, y1 - y0) // 5)  # border thickness for hollow shapes
    if shape == 0:  # filled rect
        cv2.rectangle(img, (x0, y0), (x1, y1), fill, -1)
    elif shape == 1:  # ellipse
        cv2.ellipse(img, (cx, cy), ((x1 - x0) // 2, (y1 - y0) // 2), 0, 0, 360, fill, -1)
    elif shape == 2:  # triangle (up)
        pts = np.array([[cx, y0], [x0, y1], [x1, y1]], np.int32)
        cv2.fillPoly(img, [pts], fill)
    elif shape == 3:  # diamond
        pts = np.array([[cx, y0], [x1, cy], [cx, y1], [x0, cy]], np.int32)
        cv2.fillPoly(img, [pts], fill)
    elif shape == 4:  # plus
        third_w, third_h = (x1 - x0) // 3, (y1 - y0) // 3
        cv2.rectangle(img, (x0 + third_w, y0), (x1 - third_w, y1), fill, -1)
        cv2.rectangle(img, (x0, y0 + third_h), (x1, y1 - third_h), fill, -1)
    elif shape == 5:  # X (two crossed bars)
        cv2.line(img, (x0, y0), (x1, y1), fill, t)
        cv2.line(img, (x0, y1), (x1, y0), fill, t)
    elif shape == 6:  # hollow rect
        cv2.rectangle(img, (x0, y0), (x1, y1), fill, t)
    elif shape == 7:  # ring
        cv2.ellipse(img, (cx, cy), ((x1 - x0) // 2, (y1 - y0) // 2), 0, 0, 360, fill, t)
    elif shape == 8:  # top-half rect
        cv2.rectangle(img, (x0, y0), (x1, cy), fill, -1)
    else:  # 2x2 checker
        cv2.rectangle(img, (x0, y0), (cx, cy), fill, -1)
        cv2.rectangle(img, (cx, cy), (x1, y1), fill, -1)

    for s in range(n_stripes):
        frac = (s + 1) / (n_stripes + 1)
        if vertical:
            sx = int(x0 + frac * (x1 - x0))
            cv2.line(img, (sx, y0), (sx, y1), stripe_col, max(1, t // 2))
        else:
            sy = int(y0 + frac * (y1 - y0))
            cv2.line(img, (x0, sy), (x1, sy), stripe_col, max(1, t // 2))


def make_split(root: str, split: str, n_images: int, seed: int,
               classes_used: int = 80, grayscale: bool = True,
               small_frac: float = 0.0, shape_classes: bool = False) -> None:
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, f"{split}2017")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        image_id = seed * 1000000 + i
        h = int(rng.integers(240, 481))
        w = int(rng.integers(320, 641))
        img = rng.integers(30, 120, (h, w, 3), np.uint8)
        n_obj = int(rng.integers(0, 7)) if rng.uniform() > 0.03 else 0  # some empties
        for _ in range(n_obj):
            if small_frac and rng.uniform() < small_frac:
                # COCO-"small" object: absolute area < 32^2 px in the ORIGINAL
                # frame (eval/coco_map.py area buckets). Sides 12-31 px; after the
                # 300^2 resize these are ~0.02-0.10 of the input side, straddling
                # SSD300's minimum anchor scale 21/300=0.07 (reference
                # models/ssd_model.py:176) — the round-3 VERDICT's untested regime.
                bw = float(rng.uniform(12, 32))
                bh = float(rng.uniform(12, min(32, 1024.0 / bw)))
            else:
                bw = float(rng.uniform(0.1, 0.5) * w)
                bh = float(rng.uniform(0.1, 0.5) * h)
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            cat = int(rng.choice(SPARSE_IDS[:classes_used]))
            idx = SPARSE_IDS.index(cat)
            if shape_classes:
                _draw_shape_class(img, x, y, bw, bh, idx, rng, cv2)
            else:
                # class-DETERMINISTIC color (20 hues x 2 saturations x 2 values = 80
                # well-separated colors; JPEG noise is ~±5): classes are visually
                # learnable, so integration runs can gate on trained mAP, not just on
                # the plumbing surviving
                hsv = np.uint8([[[
                    (idx % 20) * 9,
                    255 if (idx // 20) % 2 == 0 else 150,
                    255 if idx < 40 else 170,
                ]]])
                color = tuple(int(c) for c in cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0, 0])
                cv2.rectangle(img, (int(x), int(y)), (int(x + bw), int(y + bh)), color, -1)
            annotations.append({
                "id": ann_id, "image_id": image_id, "category_id": cat,
                "bbox": [round(x, 2), round(y, 2), round(bw, 2), round(bh, 2)],
                "area": round(bw * bh, 2),
                "iscrowd": int(rng.uniform() < 0.08),
            })
            ann_id += 1
        name = f"{image_id:012d}.jpg"
        if grayscale and i % 37 == 0:  # a few grayscale files (reference handles 2-D images)
            cv2.imwrite(os.path.join(img_dir, name), img.mean(-1).astype(np.uint8))
        else:
            cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({
            "id": image_id, "file_name": name, "height": h, "width": w,
            "coco_url": f"http://invalid.example/{name}",
        })

    from ssd_object_detection_tpu.data.coco import COCO_NAMES

    with open(os.path.join(root, "annotations", f"instances_{split}2017.json"), "w") as f:
        json.dump({
            "images": images,
            "annotations": annotations,
            # canonical COCO-2017 names in canonical order (data/coco.py validates)
            "categories": [
                {"id": c, "name": n} for c, n in zip(SPARSE_IDS, COCO_NAMES)
            ],
        }, f)
    print(f"{split}: {n_images} images, {ann_id - 1} annotations -> {img_dir}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--train", type=int, default=512)
    p.add_argument("--val", type=int, default=128)
    # parity runs (tools/train_reference.py) use a small class subset so both
    # stacks can learn the color signal within a CPU-trainable budget; grayscale
    # JPEGs (which destroy that signal) can be disabled for the same reason
    p.add_argument("--classes-used", type=int, default=80)
    p.add_argument("--no-grayscale", action="store_true")
    p.add_argument("--small-frac", type=float, default=0.0,
                   help="fraction of boxes drawn as COCO-'small' objects "
                        "(absolute area < 32^2 px) to exercise the mAP_small bucket")
    p.add_argument("--shape-classes", action="store_true",
                   help="encode class identity as shape x stripe geometry in random "
                        "colors (photometric-augmentation-fair) instead of "
                        "class-deterministic color")
    args = p.parse_args()
    kw = dict(classes_used=args.classes_used, grayscale=not args.no_grayscale,
              small_frac=args.small_frac, shape_classes=args.shape_classes)
    make_split(args.root, "train", args.train, seed=1, **kw)
    make_split(args.root, "val", args.val, seed=2, **kw)


if __name__ == "__main__":
    main()
