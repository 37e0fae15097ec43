"""Lightweight COCO instances index — replaces pycocotools (absent in this image).

Capability parity with the reference COCODataLoader (data_loaders/coco/make_dataset.py):
  - parses instances_{train,val}2017.json and groups annotations per image;
  - pickle-caches the parsed index next to the dataset (reference :72-86 caches the
    whole pycocotools COCO object; we cache our slimmer index);
  - remaps the 90 sparse COCO category ids to contiguous 0-79 in category-list order,
    asserting the names line up with the canonical 80-name list (reference :91-98);
  - tolerates a missing image directory by keeping each image's `coco_url` so the
    pipeline can stream (reference :60-70,116-120) — gated, since this build
    environment has no egress;
  - `mini_batch` truncation of the image list for debug subsets (reference :108-110).

The index is pure host-side metadata; pixels are decoded by data/pipeline.py workers.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# canonical COCO-2017 80 class names, index == contiguous label
# (reference data_loaders/coco/make_dataset.py:18-27)
COCO_NAMES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train", "truck", "boat",
    "traffic light", "fire hydrant", "stop sign", "parking meter", "bench", "bird", "cat",
    "dog", "horse", "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "backpack",
    "umbrella", "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball",
    "kite", "baseball bat", "baseball glove", "skateboard", "surfboard", "tennis racket",
    "bottle", "wine glass", "cup", "fork", "knife", "spoon", "bowl", "banana", "apple",
    "sandwich", "orange", "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv", "laptop", "mouse",
    "remote", "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear", "hair drier",
    "toothbrush",
]


def coco_colors(seed: int = 0) -> List[List[int]]:
    """Per-class draw colors (reference :29 uses unseeded RNG; we seed for determinism)."""
    rng = np.random.default_rng(seed)
    return [rng.integers(80, 240, (3,)).tolist() for _ in COCO_NAMES]


@dataclasses.dataclass
class ImageRecord:
    id: int
    file_name: str
    width: int
    height: int
    coco_url: str
    # per-annotation arrays (N,) / (N, 4); boxes are COCO [x, y, w, h] absolute pixels
    labels: np.ndarray
    boxes: np.ndarray
    iscrowd: np.ndarray


_CACHE_VERSION = 2


class CocoIndex:
    """Parsed annotation index for one split."""

    def __init__(self, annotation_path: str, image_root: Optional[str], cache: bool = True):
        self.annotation_path = annotation_path
        self.image_root = image_root
        if not os.path.exists(annotation_path):
            raise FileNotFoundError(f"COCO annotation file not found: {annotation_path}")
        if image_root is not None and not os.path.isdir(image_root):
            logger.warning(
                "Image dir %s missing; images would need to stream from coco_url "
                "(reference behavior; requires network egress)", image_root,
            )
            self.image_root = None

        cache_path = annotation_path + f".index_cache_v{_CACHE_VERSION}.pkl"
        if cache and os.path.exists(cache_path) and (
            os.path.getmtime(cache_path) >= os.path.getmtime(annotation_path)
        ):
            with open(cache_path, "rb") as f:
                self.records, self.cat_id_to_label, self.names = pickle.load(f)
            return

        self.records, self.cat_id_to_label, self.names = self._parse(annotation_path)
        if cache:
            try:
                with open(cache_path, "wb") as f:
                    pickle.dump((self.records, self.cat_id_to_label, self.names), f)
            except OSError as e:  # read-only dataset dirs are fine
                logger.warning("could not write annotation cache %s: %s", cache_path, e)

    @staticmethod
    def _parse(path: str) -> Tuple[List[ImageRecord], Dict[int, int], List[str]]:
        with open(path, "r") as f:
            raw = json.load(f)

        # contiguous remap in category-list order; names must match the canonical list
        # when there are exactly 80 (reference _load_label_transfer_dict, :91-98)
        categories = raw["categories"]
        cat_id_to_label = {c["id"]: i for i, c in enumerate(categories)}
        names = [c["name"] for c in categories]
        if len(names) == len(COCO_NAMES):
            assert names == COCO_NAMES, "category order differs from canonical COCO-2017"

        per_image: Dict[int, List[dict]] = {}
        for ann in raw["annotations"]:
            per_image.setdefault(ann["image_id"], []).append(ann)

        records = []
        for img in raw["images"]:
            anns = per_image.get(img["id"], [])
            boxes = np.asarray([a["bbox"] for a in anns], np.float32).reshape(-1, 4)
            labels = np.asarray([cat_id_to_label[a["category_id"]] for a in anns], np.int32)
            iscrowd = np.asarray([a.get("iscrowd", 0) for a in anns], np.int32)
            records.append(
                ImageRecord(
                    id=img["id"],
                    file_name=img["file_name"],
                    width=img["width"],
                    height=img["height"],
                    coco_url=img.get("coco_url", ""),
                    labels=labels,
                    boxes=boxes,
                    iscrowd=iscrowd,
                )
            )
        return records, cat_id_to_label, names

    def image_path(self, rec: ImageRecord) -> Optional[str]:
        if self.image_root is None:
            return None
        return os.path.join(self.image_root, rec.file_name)

    def __len__(self) -> int:
        return len(self.records)


def open_split(dataset_root: str, split: str, mini_batch: int = 0, cache: bool = True) -> CocoIndex:
    """Open train2017/val2017 with the reference's directory layout
    (data_loaders/coco/make_dataset.py:46-49). `mini_batch` truncates like :108-110."""
    assert split in ("train", "val")
    ann = os.path.join(dataset_root, "annotations", f"instances_{split}2017.json")
    img = os.path.join(dataset_root, f"{split}2017")
    index = CocoIndex(ann, img, cache=cache)
    if mini_batch:
        index.records = index.records[: int(mini_batch)]
    return index
