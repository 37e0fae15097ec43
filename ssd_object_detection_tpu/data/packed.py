"""Packed dataset cache: decode COCO once, then train from flat uint8 memmaps.

An FFCV-style ahead-of-time materialization of the deterministic per-image transform
(JPEG decode -> RGB -> resize to SxS -> GT pad; data/pipeline.load_and_transform with
augmentation off). After packing, an epoch is pure `np.memmap` reads — no JPEG
decode, no cv2, no thread pool — so host CPUs stop being the training bottleneck
(on a 1-vCPU host the decode pipeline sustains ~10 img/s while the TPU train step
consumes >500). Batches stay uint8 end-to-end (the train step scales on device),
cutting host->device transfer 4x vs f32 — over the axon tunnel (~14 MB/s) the f32
feed alone was ~2.5 s per batch-32, 80x the 31 ms R34 step it feeds.

Replaces (as an opt-in cache) the reference's per-epoch re-decode of every JPEG
through three nested tf.data generators (reference data_loaders/coco/
make_dataset.py:100-148, ssd/make_dataset.py:48-68) and its pickle annotation cache
(coco/make_dataset.py:72-86) — here the *decoded pixels* are cached, not just the
annotations.

On-disk layout (dir):
    meta.json    {"count", "image_size", "max_gt", "version", "include_crowd"}
    images.u8    (count, S, S, 3) uint8, C-order raw
    gt.npz       gt_cls (N,G) i32, gt_boxes (N,G,4) f32, gt_valid (N,G) bool,
                 gt_crowd (N,G) bool, image_id (N,) i64, orig_size (N,2) i32

Augmentation: horizontal flip operates on the resized image (data/pipeline.py:127-132)
so it composes with the cache; the SSD-paper expand/crop/photometric ops run at
ORIGINAL resolution pre-resize and therefore cannot — requesting them routes training
through the decode pipeline (train/loop.py keeps that decision).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Dict, Iterator

import numpy as np

from ssd_object_detection_tpu.data.coco import CocoIndex
from ssd_object_detection_tpu.data.pipeline import CocoPipeline, PipelineConfig

logger = logging.getLogger(__name__)

_VERSION = 3  # v3: digest covers annotation CONTENT, not just record ids


def index_digest(index: CocoIndex) -> str:
    """Stable fingerprint of WHAT an index would feed the packer: the sorted ids
    of records with >= 1 annotation AND their annotation contents (labels, boxes,
    iscrowd). Robust to decode/fetch failures at pack time (those shrink the
    packed count but not the index identity), and catches stale caches built from
    a different index — mini_batch subsets, another dataset_root, or the same ids
    RE-ANNOTATED in place (e.g. tools/make_fake_coco.py re-run with different
    params), which the id-only v2 digest silently accepted."""
    import hashlib

    h = hashlib.sha1()
    for r in sorted(index.records, key=lambda r: r.id):
        if r.boxes.shape[0] == 0:
            continue
        h.update(str(r.id).encode())
        h.update(np.ascontiguousarray(r.labels.astype(np.int32)).tobytes())
        h.update(np.ascontiguousarray(r.boxes.astype(np.float32)).tobytes())
        h.update(np.ascontiguousarray(r.iscrowd.astype(np.uint8)).tobytes())
    return h.hexdigest()


def pack_dataset(
    index: CocoIndex,
    out_dir: str,
    image_size: int = 300,
    max_gt: int = 100,
    num_workers: int = 8,
    include_crowd: bool = True,
) -> str:
    """Materialize the deterministic transform of every usable record into `out_dir`.

    Returns `out_dir`. Decoding reuses the threaded pipeline (bounded in-flight
    window); samples land in index order (shuffle happens at iteration time, like
    the reference's list shuffle, data_loaders/coco/make_dataset.py:112-113).
    """
    os.makedirs(out_dir, exist_ok=True)
    cfg = PipelineConfig(
        image_size=image_size, max_gt=max_gt, batch_size=1, shuffle=False,
        num_workers=num_workers, include_crowd=include_crowd,
    )
    pipe = CocoPipeline(index, cfg)

    s, g = image_size, max_gt
    n_max = len(index.records)
    img_path = os.path.join(out_dir, "images.u8")
    gt_cls = np.zeros((n_max, g), np.int32)
    gt_boxes = np.zeros((n_max, g, 4), np.float32)
    gt_valid = np.zeros((n_max, g), bool)
    gt_crowd = np.zeros((n_max, g), bool)
    image_id = np.zeros((n_max,), np.int64)
    orig_size = np.zeros((n_max, 2), np.int32)

    n = 0
    with open(img_path, "wb") as f:
        for sample in pipe._samples():
            img = sample["image"]
            u8 = img if img.dtype == np.uint8 else np.round(img * 255.0).astype(np.uint8)
            f.write(np.ascontiguousarray(u8).tobytes())
            gt_cls[n] = sample["gt_cls"]
            gt_boxes[n] = sample["gt_boxes"]
            gt_valid[n] = sample["gt_valid"]
            gt_crowd[n] = sample["gt_crowd"]
            image_id[n] = sample["image_id"]
            orig_size[n] = sample["orig_size"]
            n += 1
            if n % 5000 == 0:
                logger.info("packed %d/%d images", n, n_max)

    np.savez(
        os.path.join(out_dir, "gt.npz"),
        gt_cls=gt_cls[:n], gt_boxes=gt_boxes[:n], gt_valid=gt_valid[:n],
        gt_crowd=gt_crowd[:n], image_id=image_id[:n], orig_size=orig_size[:n],
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {"count": n, "image_size": s, "max_gt": g, "version": _VERSION,
             "include_crowd": include_crowd, "index_digest": index_digest(index)},
            f,
        )
    logger.info("packed %d images (%.1f MB) -> %s", n, n * s * s * 3 / 1e6, out_dir)
    return out_dir


def is_packed(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "meta.json")) and os.path.isfile(
        os.path.join(path, "images.u8")
    )


def verify_cache(
    index: CocoIndex,
    path: str,
    image_size: int,
    max_gt: int,
    include_crowd: bool = True,
) -> Dict:
    """Check that an existing packed dir belongs to (index, transform params).

    Raises ValueError on an identity/shape mismatch (digest of the index's
    annotated-record ids, image_size, max_gt, include_crowd). The packed COUNT is
    deliberately NOT part of the identity — decode/fetch failures at pack time
    legitimately shrink it — but a shortfall is loud: if the cache holds fewer
    samples than the index has annotated records, a warning reports exactly how
    many are missing (rebuild the cache after fixing the image root to recover
    them). Returns the parsed meta."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    want = {
        "image_size": image_size, "max_gt": max_gt,
        "include_crowd": include_crowd, "index_digest": index_digest(index),
    }
    got = {k: meta.get(k) for k in want}
    if got != want:
        raise ValueError(
            f"packed cache {path} does not match this config/dataset: cache has "
            f"{got}, config wants {want} (a digest mismatch means the cache was "
            f"built from a different index — mini_batch on/off, another "
            f"dataset_root, or the same ids re-annotated in place; a missing "
            f"digest means a pre-v3 cache) — delete the cache dir or point "
            f"packed_cache elsewhere"
        )
    n_annotated = sum(1 for r in index.records if r.boxes.shape[0] > 0)
    if meta["count"] < n_annotated:
        logger.warning(
            "packed cache %s holds %d samples but the index has %d annotated "
            "records: %d images were dropped at pack time (unreadable files / "
            "failed fetches — see the pack run's warnings). Training proceeds on "
            "the packed subset; rebuild the cache to recover the missing images.",
            path, meta["count"], n_annotated, n_annotated - meta["count"],
        )
    return meta


@dataclasses.dataclass
class PackedConfig:
    batch_size: int = 32
    shuffle: bool = True
    drop_remainder: bool = True
    augment_flip: bool = False
    seed: int = 0
    # uint8 batches (default): 4x less host->device traffic; the train step
    # scales on device (train/step.py). as_float restores the [0,1] f32 contract.
    as_float: bool = False


class PackedPipeline:
    """Iterate padded batches (same dict schema as CocoPipeline) from a packed dir."""

    def __init__(self, path: str, cfg: PackedConfig):
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["version"] != _VERSION:
            raise ValueError(f"packed dataset version {self.meta['version']} != {_VERSION}")
        n, s = self.meta["count"], self.meta["image_size"]
        self._images = np.memmap(
            os.path.join(path, "images.u8"), np.uint8, "r", shape=(n, s, s, 3)
        )
        self._gt = dict(np.load(os.path.join(path, "gt.npz")))
        self.cfg = cfg
        self._rng = np.random.default_rng(cfg.seed)
        self._epoch = 0

    def __len__(self) -> int:
        n, b = self.meta["count"], self.cfg.batch_size
        return n // b if self.cfg.drop_remainder else -(-n // b)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n, b = self.meta["count"], self.cfg.batch_size
        order = np.arange(n)
        if self.cfg.shuffle:
            self._rng.shuffle(order)
        flip_rng = np.random.default_rng(self.cfg.seed + 7919 * self._epoch)
        self._epoch += 1
        end = n - (n % b) if self.cfg.drop_remainder else n
        for i in range(0, end, b):
            idx = np.sort(order[i : i + b])  # sorted: sequential-ish memmap reads
            images = self._images[idx]  # uint8 copy (fancy indexing)
            if self.cfg.as_float:
                images = images.astype(np.float32) / 255.0
            batch = {
                "image": images,
                "gt_cls": self._gt["gt_cls"][idx],
                "gt_boxes": self._gt["gt_boxes"][idx].copy(),
                "gt_valid": self._gt["gt_valid"][idx],
                "gt_crowd": self._gt["gt_crowd"][idx],
                "image_id": self._gt["image_id"][idx],
                "orig_size": self._gt["orig_size"][idx],
            }
            if self.cfg.augment_flip:
                coin = flip_rng.uniform(size=len(idx)) < 0.5
                batch["image"][coin] = batch["image"][coin][:, :, ::-1]
                bx = batch["gt_boxes"]
                bx[coin, :, 0] = np.where(
                    batch["gt_valid"][coin], 1.0 - bx[coin, :, 0], bx[coin, :, 0]
                )
            yield batch
