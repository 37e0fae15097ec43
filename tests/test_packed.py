"""Packed decode-once cache (data/packed.py): parity with the decode pipeline,
shuffle/flip semantics, and memmap round-trip — all against the hermetic mini-COCO
fixture (tests/test_data.py)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ssd_object_detection_tpu.data.coco import open_split
from ssd_object_detection_tpu.data.packed import (
    PackedConfig,
    PackedPipeline,
    is_packed,
    pack_dataset,
)
from ssd_object_detection_tpu.data.pipeline import CocoPipeline, PipelineConfig

from tests.test_data import mini_coco  # noqa: F401  (module-scoped fixture)


@pytest.fixture(scope="module")
def packed_dir(mini_coco, tmp_path_factory):  # noqa: F811
    out = str(tmp_path_factory.mktemp("packed"))
    index = open_split(mini_coco, "val")
    pack_dataset(index, out, image_size=64, max_gt=5, num_workers=2)
    return out


def test_pack_and_meta(packed_dir):
    assert is_packed(packed_dir)
    pipe = PackedPipeline(packed_dir, PackedConfig(batch_size=1, shuffle=False))
    assert pipe.meta["count"] == 3  # 4 fixture images, 1 without annotations
    assert pipe.meta["image_size"] == 64 and pipe.meta["max_gt"] == 5


def test_packed_matches_decode_pipeline(mini_coco, packed_dir):  # noqa: F811
    """Batches from the cache equal the decode pipeline's (up to uint8 rounding)."""
    index = open_split(mini_coco, "val")
    live = list(
        CocoPipeline(
            index,
            PipelineConfig(image_size=64, max_gt=5, batch_size=3, shuffle=False,
                           num_workers=2),
        )
    )[0]
    packed = list(
        PackedPipeline(packed_dir, PackedConfig(batch_size=3, shuffle=False, as_float=True))
    )[0]
    assert packed["image"].dtype == np.float32
    # the decode pipeline emits uint8 with the SAME np.round(x*255) quantization
    # the cache applies, so the two paths now feed bit-identical pixels
    assert live["image"].dtype == np.uint8
    np.testing.assert_array_equal(
        np.round(packed["image"] * 255.0).astype(np.uint8), live["image"]
    )
    for k in ("gt_cls", "gt_boxes", "gt_valid", "gt_crowd", "image_id", "orig_size"):
        np.testing.assert_array_equal(packed[k], live[k], err_msg=k)

    # default contract is uint8 (4x less H2D traffic; train step scales on device)
    packed_u8 = list(PackedPipeline(packed_dir, PackedConfig(batch_size=3, shuffle=False)))[0]
    assert packed_u8["image"].dtype == np.uint8
    np.testing.assert_array_equal(packed_u8["image"], live["image"])


def test_packed_shuffle_and_epochs(packed_dir):
    pipe = PackedPipeline(packed_dir, PackedConfig(batch_size=1, shuffle=True, seed=3))
    e1 = [b["image_id"][0] for b in pipe]
    e2 = [b["image_id"][0] for b in pipe]
    assert sorted(e1) == sorted(e2)  # same images every epoch
    pipe_b = PackedPipeline(packed_dir, PackedConfig(batch_size=1, shuffle=True, seed=3))
    assert e1 == [b["image_id"][0] for b in pipe_b]  # deterministic per seed


def test_packed_flip(packed_dir):
    """Flip mirrors image + valid boxes and leaves padded rows untouched."""
    plain = list(PackedPipeline(packed_dir, PackedConfig(batch_size=3, shuffle=False)))[0]
    flipped = None
    for seed in range(20):
        cand = list(
            PackedPipeline(
                packed_dir,
                PackedConfig(batch_size=3, shuffle=False, augment_flip=True, seed=seed),
            )
        )[0]
        if not np.allclose(cand["image"], plain["image"]):
            flipped = cand
            break
    assert flipped is not None, "no seed flipped anything in 20 tries"
    coin = ~np.isclose(flipped["image"], plain["image"]).all(axis=(1, 2, 3))
    np.testing.assert_allclose(
        flipped["image"][coin], plain["image"][coin][:, :, ::-1], atol=1e-6
    )
    v = plain["gt_valid"]
    np.testing.assert_allclose(
        flipped["gt_boxes"][coin][v[coin]][:, 0],
        1.0 - plain["gt_boxes"][coin][v[coin]][:, 0],
        rtol=1e-5,
    )
    # padded rows stay zero; unflipped images untouched
    np.testing.assert_array_equal(flipped["gt_boxes"][~v], plain["gt_boxes"][~v])
    np.testing.assert_array_equal(flipped["gt_boxes"][~coin], plain["gt_boxes"][~coin])


def test_packed_remainder(packed_dir):
    keep = list(
        PackedPipeline(packed_dir, PackedConfig(batch_size=2, shuffle=False,
                                                drop_remainder=False))
    )
    assert [b["image"].shape[0] for b in keep] == [2, 1]
    drop = list(PackedPipeline(packed_dir, PackedConfig(batch_size=2, shuffle=False)))
    assert [b["image"].shape[0] for b in drop] == [2]


def test_trainer_uses_packed_cache(mini_coco, tmp_path):  # noqa: F811
    """Trainer end-to-end on the COCO fixture with packed_cache: the cache is built
    on first use and the loop trains from it (no decode on epoch 2+)."""
    import os

    from ssd_object_detection_tpu.config import Config
    from ssd_object_detection_tpu.train.loop import Trainer
    from tests.test_trainer import MODEL_SPECS  # registers "tiny-test"

    assert "tiny-test" in MODEL_SPECS
    # alias the fixture's val split as train (train_batches reads the train split)
    ann = os.path.join(mini_coco, "annotations")
    if not os.path.exists(os.path.join(ann, "instances_train2017.json")):
        os.symlink(os.path.join(ann, "instances_val2017.json"),
                   os.path.join(ann, "instances_train2017.json"))
        os.symlink(os.path.join(mini_coco, "val2017"),
                   os.path.join(mini_coco, "train2017"))

    cfg = Config()
    cfg.data.dataset = "coco"
    cfg.data.dataset_root = mini_coco
    cfg.data.num_classes = 80
    cfg.data.max_gt = 5
    cfg.data.num_workers = 2
    cfg.data.packed_cache = str(tmp_path / "packed")
    cfg.model.variant = "tiny-test"
    cfg.model.precision = "float32"
    cfg.model.log_dir = str(tmp_path)
    cfg.model.log_interval = 0
    cfg.model.train.epoch = 2
    cfg.model.train.batch_size = 3
    cfg.model.warmup.step = 1
    trainer = Trainer(cfg, run_dir=str(tmp_path / "run"))
    state = trainer.train()
    assert is_packed(cfg.data.packed_cache)  # cache was materialized
    assert int(state.step) == 2  # 3 usable images / bs 3 = 1 step x 2 epochs


def test_verify_cache_identity_and_shortfall(mini_coco, packed_dir, caplog):  # noqa: F811
    """verify_cache: accepts its own index, raises on a different index (digest),
    and warns — not errors — when the pack dropped images (count shortfall)."""
    import json
    import logging
    import os

    from ssd_object_detection_tpu.data.packed import verify_cache

    index = open_split(mini_coco, "val")
    meta = verify_cache(index, packed_dir, image_size=64, max_gt=5)
    assert meta["count"] == 3

    # different index (mini_batch subset) -> digest mismatch -> ValueError
    sub = open_split(mini_coco, "val", mini_batch=2)
    with pytest.raises(ValueError, match="digest"):
        verify_cache(sub, packed_dir, image_size=64, max_gt=5)

    # wrong transform params -> ValueError
    with pytest.raises(ValueError, match="image_size"):
        verify_cache(index, packed_dir, image_size=128, max_gt=5)

    # simulate pack-time decode failures: shrink count only -> warning, no raise
    meta_path = os.path.join(packed_dir, "meta.json")
    orig = json.load(open(meta_path))
    try:
        json.dump(dict(orig, count=1), open(meta_path, "w"))
        with caplog.at_level(logging.WARNING):
            verify_cache(index, packed_dir, image_size=64, max_gt=5)
        assert any("dropped at pack time" in r.message for r in caplog.records)
    finally:
        json.dump(orig, open(meta_path, "w"))
