"""COCO index + pipeline tests against a generated mini-COCO fixture (hermetic —
the reference's data tests require a real COCO download, SURVEY.md section 4)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ssd_object_detection_tpu.data.coco import COCO_NAMES, coco_colors, open_split
from ssd_object_detection_tpu.data.pipeline import CocoPipeline, PipelineConfig, load_and_transform


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    """4 images (one with no annotations, one grayscale-ish), COCO-format JSON."""
    root = tmp_path_factory.mktemp("coco")
    (root / "annotations").mkdir()
    (root / "val2017").mkdir()
    rng = np.random.default_rng(0)

    images, annotations = [], []
    ann_id = 1
    sizes = [(120, 160), (80, 100), (200, 150), (64, 64)]
    for i, (h, w) in enumerate(sizes):
        name = f"{i:012d}.jpg"
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(root / "val2017" / name), img)
        images.append({"id": 100 + i, "file_name": name, "width": w, "height": h,
                       "coco_url": f"http://example.com/{name}"})
        if i == 1:
            continue  # image with zero annotations -> must be skipped
        for j in range(2):
            bw, bh = w // 3, h // 3
            x, y = j * w // 3, j * h // 3
            annotations.append({
                "id": ann_id, "image_id": 100 + i, "category_id": [1, 18][j],  # person, dog
                "bbox": [x, y, bw, bh], "iscrowd": j, "area": bw * bh,
            })
            ann_id += 1

    categories = [{"id": cid, "name": name} for cid, name in zip(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24,
         25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 46, 47, 48, 49,
         50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74,
         75, 76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87, 88, 89, 90],
        COCO_NAMES,
    )]
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations, "categories": categories}, f)
    return str(root)


def test_index_parses_and_remaps(mini_coco):
    index = open_split(mini_coco, "val")
    assert len(index) == 4
    assert index.names == COCO_NAMES
    # sparse COCO ids 1 (person) and 18 (dog) -> contiguous 0 and 16
    assert index.cat_id_to_label[1] == 0
    assert index.cat_id_to_label[18] == COCO_NAMES.index("dog") == 16
    rec = index.records[0]
    assert rec.labels.tolist() == [0, 16]
    assert rec.boxes.shape == (2, 4)


def test_index_cache_roundtrip(mini_coco):
    index1 = open_split(mini_coco, "val")
    ann = os.path.join(mini_coco, "annotations", "instances_val2017.json")
    assert any(f.startswith("instances_val2017.json.index_cache") for f in os.listdir(os.path.dirname(ann)))
    index2 = open_split(mini_coco, "val")  # from cache
    assert len(index2) == len(index1)
    assert index2.records[0].labels.tolist() == index1.records[0].labels.tolist()


def test_mini_batch_truncation(mini_coco):
    assert len(open_split(mini_coco, "val", mini_batch=2)) == 2


def test_load_and_transform(mini_coco):
    index = open_split(mini_coco, "val")
    cfg = PipelineConfig(image_size=300, max_gt=10, batch_size=2)
    sample = load_and_transform(index, index.records[0], cfg)
    assert sample["image"].shape == (300, 300, 3)
    # uint8 at the pipeline boundary: 4x less H2D; the train step / predict fns
    # scale on device, and the quantization matches data/packed.py exactly
    assert sample["image"].dtype == np.uint8
    assert sample["gt_valid"].sum() == 2
    # first box: bbox [0,0,53,40] in a 160x120 image -> cxcywh relative
    np.testing.assert_allclose(
        sample["gt_boxes"][0],
        [53 / 2 / 160, 40 / 2 / 120, 53 / 160, 40 / 120],
        rtol=1e-5,
    )
    assert int(sample["image_id"]) == 100
    assert sample["orig_size"].tolist() == [120, 160]


def test_empty_annotation_image_skipped(mini_coco):
    index = open_split(mini_coco, "val")
    cfg = PipelineConfig(image_size=64, max_gt=5, batch_size=1)
    assert load_and_transform(index, index.records[1], cfg) is None


def test_pipeline_batches(mini_coco):
    index = open_split(mini_coco, "val")
    cfg = PipelineConfig(image_size=64, max_gt=5, batch_size=3, shuffle=True, num_workers=2)
    batches = list(CocoPipeline(index, cfg))
    assert len(batches) == 1  # 3 usable images, batch 3, drop remainder
    b = batches[0]
    assert b["image"].shape == (3, 64, 64, 3)
    assert b["gt_boxes"].shape == (3, 5, 4)
    assert b["gt_valid"].any(axis=1).all()


def test_crowd_filter(mini_coco):
    index = open_split(mini_coco, "val")
    cfg = PipelineConfig(image_size=64, max_gt=5, batch_size=1, include_crowd=False)
    sample = load_and_transform(index, index.records[0], cfg)
    assert sample["gt_valid"].sum() == 1  # second ann has iscrowd=1


def test_coco_colors_deterministic():
    assert coco_colors() == coco_colors()
    assert len(coco_colors()) == 80


def test_flip_augmentation(mini_coco):
    index = open_split(mini_coco, "val")
    base = PipelineConfig(image_size=64, max_gt=5, batch_size=1, augment_flip=False)
    flip = PipelineConfig(image_size=64, max_gt=5, batch_size=1, augment_flip=True, seed=0)
    rec = index.records[0]
    s0 = load_and_transform(index, rec, base)
    # find a seed whose coin flips this image
    flipped = None
    for seed in range(20):
        cfg = PipelineConfig(image_size=64, max_gt=5, batch_size=1, augment_flip=True, seed=seed)
        s1 = load_and_transform(index, rec, cfg)
        if not np.allclose(s1["image"], s0["image"]):
            flipped = s1
            break
    assert flipped is not None, "no seed produced a flip in 20 tries"
    np.testing.assert_allclose(flipped["image"], s0["image"][:, ::-1], atol=1e-6)
    # boxes mirror: cx -> 1 - cx, everything else unchanged
    v = s0["gt_valid"]
    np.testing.assert_allclose(flipped["gt_boxes"][v][:, 0], 1 - s0["gt_boxes"][v][:, 0], rtol=1e-5)
    np.testing.assert_allclose(flipped["gt_boxes"][v][:, 1:], s0["gt_boxes"][v][:, 1:], rtol=1e-5)


def test_pipeline_backpressure(monkeypatch):
    """A slow consumer must bound in-flight decode work (VERDICT round-1 item 4):
    5k records, consume a few batches, assert the producer never ran far ahead."""
    import time as _time
    from types import SimpleNamespace

    from ssd_object_detection_tpu.data import pipeline as pl

    produced = [0]

    def fake_transform(index, rec, cfg):
        produced[0] += 1
        return {
            "image": np.zeros((4, 4, 3), np.float32),
            "gt_cls": np.zeros((cfg.max_gt,), np.int32),
            "gt_boxes": np.zeros((cfg.max_gt, 4), np.float32),
            "gt_valid": np.zeros((cfg.max_gt,), bool),
            "image_id": np.int64(rec),
            "orig_size": np.array([4, 4], np.int32),
        }

    monkeypatch.setattr(pl, "load_and_transform", fake_transform)
    index = SimpleNamespace(records=list(range(5000)))
    cfg = pl.PipelineConfig(batch_size=8, shuffle=False, num_workers=4, prefetch=2,
                            max_gt=4)
    pipe = pl.CocoPipeline.__new__(pl.CocoPipeline)
    pipe.index = index
    pipe.cfg = cfg
    pipe._rng = np.random.default_rng(0)
    pipe._epoch = 0

    overrun = []
    for i, batch in enumerate(pipe._batches_sync()):
        assert batch["image"].shape[0] == 8
        _time.sleep(0.005)  # slow consumer
        overrun.append(produced[0] - (i + 1) * 8)
        if i >= 9:
            break
    # bound = in-flight window (16) + one assembling batch + scheduling slack;
    # without backpressure this would race toward 5000
    assert max(overrun) <= 16 + 8 + 8, max(overrun)
