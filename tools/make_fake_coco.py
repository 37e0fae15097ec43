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


def make_split(root: str, split: str, n_images: int, seed: int,
               classes_used: int = 80, grayscale: bool = True) -> None:
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
            bw = float(rng.uniform(0.1, 0.5) * w)
            bh = float(rng.uniform(0.1, 0.5) * h)
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            cat = int(rng.choice(SPARSE_IDS[:classes_used]))
            # class-DETERMINISTIC color (20 hues x 2 saturations x 2 values = 80
            # well-separated colors; JPEG noise is ~±5): classes are visually
            # learnable, so integration runs can gate on trained mAP, not just on
            # the plumbing surviving
            idx = SPARSE_IDS.index(cat)
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
    args = p.parse_args()
    make_split(args.root, "train", args.train, seed=1,
               classes_used=args.classes_used, grayscale=not args.no_grayscale)
    make_split(args.root, "val", args.val, seed=2,
               classes_used=args.classes_used, grayscale=not args.no_grayscale)


if __name__ == "__main__":
    main()
