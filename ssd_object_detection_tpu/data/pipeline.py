"""Host data pipeline: threaded decode/resize -> padded, batched numpy arrays.

Re-architecture of the reference's three nested `tf.data.from_generator` layers
(SURVEY.md section 3.4): one thread-pooled pipeline that performs only cheap host work
(JPEG decode, resize, box format conversion, padding) and hands fixed-shape batches to
the device, where matching/encoding happen inside the jitted train step
(ops/matching.py). cv2 releases the GIL during imdecode/resize, so a thread pool
genuinely parallelizes the decode path.

Per-image transform parity:
  - decode to RGB, scale to [0,1] float32 (reference coco/make_dataset.py:117);
  - grayscale -> 3 channels (reference :129-130);
  - skip images with zero annotations (reference :126-127);
  - COCO [x,y,w,h] -> center cxcywh (reference :132), resize to SxS
    (reference ssd/make_dataset.py:40), boxes -> relative coords (:43-46);
  - GTs padded to max_gt with a validity mask (TPU static shapes); images with more
    than max_gt objects keep the first max_gt (COCO max is 93 with default 100);
  - epoch-level shuffle of the image list (reference :112-113), batches drop the
    remainder (reference ssd_model.py:225).
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from ssd_object_detection_tpu.data.coco import CocoIndex, ImageRecord

logger = logging.getLogger(__name__)

try:
    import cv2

    cv2.setNumThreads(0)  # we parallelize at the pipeline level
except ImportError:  # pragma: no cover - cv2 is in the base image
    cv2 = None


@dataclasses.dataclass
class PipelineConfig:
    image_size: int = 300
    max_gt: int = 100
    batch_size: int = 32
    shuffle: bool = True
    num_workers: int = 8
    prefetch: int = 4
    drop_remainder: bool = True
    include_crowd: bool = True  # reference makes no iscrowd distinction for training
    augment_flip: bool = False  # random horizontal flip (box-aware); the reference
    # has NO augmentation at all (SURVEY.md component 7/8) — this is an opt-in upgrade
    augment_expand: bool = False  # SSD-paper zoom-out onto a mean-color canvas
    augment_crop: bool = False  # SSD-paper min-IoU sampled patch
    augment_photometric: bool = False  # brightness/contrast/saturation jitter
    seed: int = 0


def load_and_transform(index: CocoIndex, rec: ImageRecord, cfg: PipelineConfig) -> Optional[Dict[str, np.ndarray]]:
    """One image -> training sample dict, or None if it should be skipped."""
    if rec.boxes.shape[0] == 0:
        return None  # reference skips empty images (coco/make_dataset.py:126-127)
    path = index.image_path(rec)
    if path is not None:
        image = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR uint8, grayscale already expanded
    else:
        # stream from coco_url like the reference (coco/make_dataset.py:116-120);
        # requires network egress
        import urllib.request

        logger.debug("downloading image: %s", rec.coco_url)
        try:
            with urllib.request.urlopen(rec.coco_url, timeout=30) as r:
                data = np.frombuffer(r.read(), np.uint8)
            image = cv2.imdecode(data, cv2.IMREAD_COLOR)
        except OSError as e:
            logger.warning("failed to fetch %s: %s; skipping", rec.coco_url, e)
            return None
    if image is None:
        logger.warning("unreadable image %s; skipping", path or rec.coco_url)
        return None
    image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
    h, w = image.shape[:2]
    size = cfg.image_size

    boxes = rec.boxes
    labels = rec.labels
    crowd = rec.iscrowd.astype(bool)
    if not cfg.include_crowd:
        keep = ~crowd
        boxes, labels, crowd = boxes[keep], labels[keep], crowd[keep]
        if boxes.shape[0] == 0:
            return None
    # xywh -> cxcywh, then relative to the ORIGINAL image size
    # (reference coco/make_dataset.py:132 + ssd/make_dataset.py:43-46)
    cxcywh = boxes.astype(np.float32).copy()
    cxcywh[:, :2] += cxcywh[:, 2:] / 2
    cxcywh /= np.array([w, h, w, h], np.float32)

    if cfg.augment_expand or cfg.augment_crop or cfg.augment_photometric:
        # SSD-paper geometric/photometric augmentation runs at ORIGINAL resolution,
        # before the resize (data/augment.py)
        from ssd_object_detection_tpu.data.augment import ssd_augment

        aug_rng = np.random.default_rng((cfg.seed + 1) * 99991 + rec.id)
        image01 = image.astype(np.float32) / 255.0
        image01, cxcywh, labels = ssd_augment(
            image01, cxcywh, labels, aug_rng,
            expand=cfg.augment_expand, crop=cfg.augment_crop,
            photometric=cfg.augment_photometric,
        )
        if cxcywh.shape[0] == 0:
            return None
        # geometric augmentation drops/reorders boxes; crowd alignment is lost, and
        # training (the only augmented path) never reads it — evaluation pipelines
        # run without augmentation (train/loop.py val_batches)
        crowd = np.zeros((cxcywh.shape[0],), bool)
        image = cv2.resize(image01, (size, size))
    else:
        image = cv2.resize(image, (size, size)).astype(np.float32) / 255.0

    if cfg.augment_flip:
        # per-image deterministic coin keyed by (seed, image id)
        flip_rng = np.random.default_rng((cfg.seed + 1) * 1000003 + rec.id)
        if flip_rng.uniform() < 0.5:
            image = image[:, ::-1]
            cxcywh[:, 0] = 1.0 - cxcywh[:, 0]

    n = min(cxcywh.shape[0], cfg.max_gt)
    gt_boxes = np.zeros((cfg.max_gt, 4), np.float32)
    gt_cls = np.zeros((cfg.max_gt,), np.int32)
    gt_valid = np.zeros((cfg.max_gt,), bool)
    gt_crowd = np.zeros((cfg.max_gt,), bool)
    gt_boxes[:n], gt_cls[:n], gt_valid[:n] = cxcywh[:n], labels[:n], True
    gt_crowd[:n] = crowd[:n]

    # Emit uint8: over the axon tunnel a float32 batch costs 4x the transfer of
    # uint8 (2.5-4 s/step vs ~0.2 measured, BASELINE.md) and both the train step
    # and the predict fns scale uint8 -> [0,1] on device. The quantization here is
    # the SAME np.round(x*255) the packed cache applies (data/packed.py), so the
    # decode path and the packed path now feed bit-identical pixels; internal
    # augmentation math stays float32 at original resolution.
    image_u8 = np.clip(np.round(image * 255.0), 0.0, 255.0).astype(np.uint8)

    return {
        "image": image_u8,
        "gt_cls": gt_cls,
        "gt_boxes": gt_boxes,
        "gt_valid": gt_valid,
        "gt_crowd": gt_crowd,  # COCOeval crowd-ignore flags (eval/coco_map.py)
        "image_id": np.int64(rec.id),
        "orig_size": np.array([h, w], np.int32),
    }


class CocoPipeline:
    """Iterable over padded batches, with a background prefetch thread."""

    def __init__(self, index: CocoIndex, cfg: PipelineConfig):
        self.index = index
        self.cfg = cfg
        self._rng = np.random.default_rng(cfg.seed)
        self._epoch = 0

    def __len__(self) -> int:
        # approximate (empty-annotation images are skipped at iteration time)
        return len(self.index) // self.cfg.batch_size

    def _samples(self) -> Iterator[Dict[str, np.ndarray]]:
        records = list(self.index.records)
        if self.cfg.shuffle:
            self._rng.shuffle(records)
        # vary augmentation coins across epochs while staying deterministic per epoch
        cfg = dataclasses.replace(self.cfg, seed=self.cfg.seed + 7919 * self._epoch)
        self._epoch += 1
        # Bounded in-flight window (~2x workers): ThreadPoolExecutor.map would submit
        # ALL records eagerly, letting workers decode the entire epoch ahead of a
        # slow consumer (~100 GB resident for COCO train2017). Futures are consumed
        # in submission order, so sample order stays deterministic.
        window = max(2 * self.cfg.num_workers, self.cfg.batch_size)
        with ThreadPoolExecutor(max_workers=self.cfg.num_workers) as pool:
            inflight: deque = deque()
            it = iter(records)
            try:
                while True:
                    while len(inflight) < window:
                        try:
                            rec = next(it)
                        except StopIteration:
                            break
                        inflight.append(
                            pool.submit(load_and_transform, self.index, rec, cfg)
                        )
                    if not inflight:
                        break
                    sample = inflight.popleft().result()
                    if sample is not None:
                        yield sample
            finally:
                for f in inflight:  # consumer stopped early: drop queued work
                    f.cancel()

    def _batches_sync(self) -> Iterator[Dict[str, np.ndarray]]:
        stack = []
        for sample in self._samples():
            stack.append(sample)
            if len(stack) == self.cfg.batch_size:
                yield {k: np.stack([s[k] for s in stack]) for k in stack[0]}
                stack = []
        if stack and not self.cfg.drop_remainder:
            yield {k: np.stack([s[k] for s in stack]) for k in stack[0]}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of batches, assembled ahead of the consumer by a prefetch thread."""
        q: "queue.Queue" = queue.Queue(maxsize=self.cfg.prefetch)
        sentinel = object()
        error: list = []

        def producer():
            try:
                for batch in self._batches_sync():
                    q.put(batch)
            except BaseException as e:  # surfaced to the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        thread.join()
        if error:
            raise error[0]
