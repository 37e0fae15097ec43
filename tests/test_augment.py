"""SSD-paper augmentation tests: geometry invariants under expand/crop/photometric."""

import numpy as np
import pytest

from ssd_object_detection_tpu.data.augment import (
    photometric_distort,
    random_expand,
    random_min_iou_crop,
    ssd_augment,
)


def _scene():
    rng = np.random.default_rng(0)
    image = rng.uniform(0, 1, (120, 160, 3)).astype(np.float32)
    boxes = np.float32([[0.5, 0.5, 0.3, 0.4], [0.2, 0.3, 0.1, 0.15]])
    labels = np.int32([3, 7])
    return image, boxes, labels


def test_expand_keeps_pixels_and_shrinks_boxes():
    image, boxes, labels = _scene()
    rng = np.random.default_rng(1)
    out_img, out_boxes = random_expand(image, boxes, rng, p=1.0)
    assert out_img.shape[0] >= image.shape[0] and out_img.shape[1] >= image.shape[1]
    # areas shrink by the same factor for all boxes
    factor = (out_boxes[:, 2] * out_boxes[:, 3]) / (boxes[:, 2] * boxes[:, 3])
    np.testing.assert_allclose(factor, factor[0], rtol=1e-5)
    assert factor[0] <= 1.0
    # boxes stay inside [0, 1]
    assert (out_boxes[:, 0] - out_boxes[:, 2] / 2 >= -1e-6).all()
    assert (out_boxes[:, 0] + out_boxes[:, 2] / 2 <= 1 + 1e-6).all()


def test_crop_keeps_centered_boxes():
    image, boxes, labels = _scene()
    for seed in range(20):
        out = random_min_iou_crop(image, boxes, labels, np.random.default_rng(seed))
        if out is None:
            continue
        img, b, l = out
        assert img.size > 0
        assert b.shape[0] == l.shape[0] >= 1
        # boxes valid and inside the crop
        assert (b[:, 2] > 0).all() and (b[:, 3] > 0).all()
        assert (b[:, 0] > 0).all() and (b[:, 0] < 1).all()
        break
    else:
        pytest.fail("no crop produced in 20 seeds")


def test_photometric_stays_in_range():
    image, _, _ = _scene()
    out = photometric_distort(image, np.random.default_rng(2), p=1.0)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, image)


def test_full_recipe_deterministic():
    image, boxes, labels = _scene()
    a = ssd_augment(image, boxes, labels, np.random.default_rng(5))
    b = ssd_augment(image, boxes, labels, np.random.default_rng(5))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])


def test_pipeline_integration(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import json

    from ssd_object_detection_tpu.data.coco import open_split
    from ssd_object_detection_tpu.data.pipeline import PipelineConfig, load_and_transform

    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(str(root / "val2017" / "a.jpg"), rng.integers(0, 255, (100, 150, 3), np.uint8))
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump({
            "images": [{"id": 1, "file_name": "a.jpg", "width": 150, "height": 100}],
            "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                             "bbox": [30, 20, 60, 50], "iscrowd": 0, "area": 3000}],
            "categories": [{"id": 1, "name": "person"}],
        }, f)
    index = open_split(str(root), "val")
    cfg = PipelineConfig(image_size=64, max_gt=4, batch_size=1, augment_expand=True,
                         augment_crop=True, augment_photometric=True, augment_flip=True)
    sample = load_and_transform(index, index.records[0], cfg)
    assert sample is not None
    assert sample["image"].shape == (64, 64, 3)
    # pipeline boundary contract is uint8 (data/pipeline.py quantizes once at the
    # end; augmentation math ran in float32 before that)
    assert sample["image"].dtype == np.uint8
    v = sample["gt_valid"]
    assert v.any()
    b = sample["gt_boxes"][v]
    assert (b[:, 2] > 0).all() and (b[:, 3] > 0).all()
