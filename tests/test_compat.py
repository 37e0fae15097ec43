"""Reference-API compatibility facade tests."""

import numpy as np
import pytest

from ssd_object_detection_tpu.compat import SSDDataLoader, SSDObjectDetectionModel
from ssd_object_detection_tpu.models.ssd import MODEL_SPECS
from tests.test_train_step import TINY_MODEL

MODEL_SPECS.setdefault("tiny-test", TINY_MODEL)


def test_data_loader_rejects_unknown_dataset():
    with pytest.raises(ValueError):
        SSDDataLoader("/nonexistent", dataset="voc")


def test_model_constructor_and_accessors(tmp_path):
    m = SSDObjectDetectionModel(classes=8, log_dir=str(tmp_path), variant="tiny-test",
                                precision="float32")
    pb = m.get_prior_box()
    assert pb.shape == (TINY_MODEL.anchor_spec.num_anchors, 4)
    assert str(tmp_path) in m.get_log_dir()
    model, params = m.get_model()
    assert params is not None


def test_model_save_load_roundtrip(tmp_path):
    m = SSDObjectDetectionModel(classes=8, log_dir=str(tmp_path), variant="tiny-test",
                                precision="float32")
    p = str(tmp_path / "w.msgpack")
    m.save(p)
    m2 = SSDObjectDetectionModel(classes=8, log_dir=str(tmp_path), variant="tiny-test",
                                 precision="float32")
    m2.load(p)
    import jax

    for a, b in zip(jax.tree.leaves(m._params), jax.tree.leaves(m2._params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_predict_and_visualize(tmp_path):
    m = SSDObjectDetectionModel(classes=8, log_dir=str(tmp_path), variant="tiny-test",
                                precision="float32")
    det = m.predict(np.zeros((2, 64, 64, 3), np.float32))
    assert det.boxes.shape[0] == 2
    img = m.visualize(np.zeros((64, 64, 3), np.float32), thresh=0.9)
    assert img.shape == (64, 64, 3)
    grid = m.visualize_prior_box(max_cells=2)
    assert grid.shape[0] == 64


def test_model_train_through_facade(tmp_path):
    m = SSDObjectDetectionModel(classes=8, log_dir=str(tmp_path), variant="tiny-test",
                                precision="float32")
    cfg = SSDObjectDetectionModel.TrainConfig(
        epoch=1, batch_size=4, warmup=True, warmup_step=2, visualization_log_interval=0
    )
    state = m.train(data_loader=None, cfg=cfg)  # synthetic data (no dataset_root)
    assert int(state.step) >= 1


def test_show_summary_and_log_writer(tmp_path, capsys):
    m = SSDObjectDetectionModel(classes=8, log_dir=str(tmp_path), variant="tiny-test",
                                precision="float32")
    table = m.show_summary()
    assert "TOTAL" in table and "kernel" in table
    assert table in capsys.readouterr().out
    w = m.get_log_writer()
    assert w is m.get_log_writer()  # cached


def test_visualize_dataset(tmp_path):
    m = SSDObjectDetectionModel(classes=8, log_dir=str(tmp_path), variant="tiny-test",
                                precision="float32")
    batch = {
        "image": np.full((2, 64, 64, 3), 0.5, np.float32),
        "gt_cls": np.array([[1, 2], [3, 0]], np.int32),
        "gt_boxes": np.array(
            [[[0.5, 0.5, 0.3, 0.3], [0.2, 0.2, 0.1, 0.1]],
             [[0.7, 0.7, 0.2, 0.2], [0.0, 0.0, 0.0, 0.0]]], np.float32),
        "gt_valid": np.array([[True, True], [True, False]]),
    }
    imgs = m.visualize_dataset([batch, batch], max_images=3)
    assert len(imgs) == 3
    assert imgs[0].shape == (64, 64, 3)
