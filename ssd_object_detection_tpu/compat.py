"""Reference-API compatibility facade.

The reference's public surface (SURVEY.md section 1) is two classes:
  - `SSDDataLoader(dataset_root, dataset="coco", shuffle=True, mini_batch=0)` with
    `.get_dataset() -> (train, val)` and `.get_names_and_colors()`
    (reference data_loaders/ssd/make_dataset.py:15-87);
  - `SSDObjectDetectionModel(classes, log_dir)` with nested `TrainConfig`, and
    methods `train/save/load/get_prior_box/get_log_dir/visualize*`
    (reference models/ssd_model.py:19-490).

These wrappers give reference users the same constructor/call shapes on top of the
TPU-native core (Trainer, CocoPipeline, predict). They are thin adapters — new code
should use the core APIs directly.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssd_object_detection_tpu.config import Config
from ssd_object_detection_tpu.data.coco import COCO_NAMES, coco_colors, open_split
from ssd_object_detection_tpu.data.pipeline import CocoPipeline, PipelineConfig

logger = logging.getLogger(__name__)


class SSDDataLoader:
    """Reference data_loaders.SSDDataLoader parity (ssd/make_dataset.py:15-87)."""

    def __init__(self, dataset_root: str, dataset: str = "coco", shuffle: bool = True,
                 mini_batch: int = 0, image_size: int = 300, max_gt: int = 100,
                 batch_size: int = 32):
        if dataset.lower() != "coco":
            raise ValueError(f"unsupported dataset {dataset!r}")  # reference :32-33
        self._names = COCO_NAMES
        self._colors = coco_colors()
        cfg = PipelineConfig(image_size=image_size, max_gt=max_gt, batch_size=batch_size,
                             shuffle=shuffle)
        self._train = CocoPipeline(open_split(dataset_root, "train", mini_batch=mini_batch), cfg)
        self._val = CocoPipeline(open_split(dataset_root, "val", mini_batch=mini_batch), cfg)

    def get_dataset(self) -> Tuple[CocoPipeline, CocoPipeline]:
        return self._train, self._val

    def get_names_and_colors(self):
        return self._names, self._colors


class SSDObjectDetectionModel:
    """Reference models.SSDObjectDetectionModel parity (models/ssd_model.py:19-490).

    Same constructor (classes=80 foreground, background appended internally with the
    LAST channel index; timestamped run dir under log_dir) and method names; training
    runs the TPU-native Trainer underneath.
    """

    class TrainConfig:
        """Reference TrainConfig (models/ssd_model.py:20-40), optimizer args as
        (name, lr) descriptors rather than live tf optimizer objects."""

        def __init__(self, epoch: int, batch_size: int,
                     optimizer: str = "adam", lr_initial: float = 1e-3,
                     lr_decay_step: int = 100, lr_decay_rate: float = 0.99,
                     warmup: bool = True, warmup_step: int = 1000,
                     warmup_lr_start: float = 1e-6, warmup_lr_end: float = 1e-3,
                     visualization_log_interval: int = 10,
                     split_batch: bool = False, split_batch_size: int = 4):
            self.epoch = epoch
            self.batch_size = batch_size
            self.optimizer = optimizer
            self.lr_initial = lr_initial
            self.lr_decay_step = lr_decay_step
            self.lr_decay_rate = lr_decay_rate
            self.warmup = warmup
            self.warmup_step = warmup_step
            self.warmup_lr_start = warmup_lr_start
            self.warmup_lr_end = warmup_lr_end
            self.visualization_log_interval = visualization_log_interval
            self.split_batch = split_batch
            self.split_batch_size = split_batch_size

    def __init__(self, classes: int, log_dir: str, variant: str = "ssd300",
                 precision: str = "bfloat16"):
        from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD
        from ssd_object_detection_tpu.ops.anchors import generate_anchors

        stamp = time.strftime("%Y-%m-%d-%H%M%S", time.localtime())
        self._log_dir = os.path.join(log_dir, stamp)
        self._classes = classes
        self._variant = variant
        self._precision = precision
        spec = MODEL_SPECS[variant]
        dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
        self._model = SSD(num_classes=classes + 1, spec=spec, dtype=dtype)
        self._spec = spec
        self._prior_box = generate_anchors(spec.anchor_spec)
        self._params = self._model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, spec.image_size, spec.image_size, 3))
        )
        self._trainer = None

    # ------------------------------------------------------------- training
    def train(self, data_loader, cfg: "SSDObjectDetectionModel.TrainConfig",
              dataset_root: Optional[str] = None):
        from ssd_object_detection_tpu.train.loop import Trainer

        config = Config()
        config.data.dataset = "coco" if dataset_root else "synthetic"
        if dataset_root:
            config.data.dataset_root = dataset_root
        config.data.num_classes = self._classes
        config.model.variant = self._variant
        config.model.precision = self._precision
        config.model.log_dir = os.path.dirname(self._log_dir) or "."
        config.model.log_interval = cfg.visualization_log_interval
        config.model.train.epoch = cfg.epoch
        config.model.train.batch_size = cfg.batch_size
        config.model.train.optimizer.name = cfg.optimizer
        config.model.train.lr.initial = cfg.lr_initial
        config.model.train.lr.decay_step = cfg.lr_decay_step
        config.model.train.lr.decay_rate = cfg.lr_decay_rate
        config.model.warmup.enable = cfg.warmup
        config.model.warmup.step = cfg.warmup_step
        config.model.warmup.lr.start = cfg.warmup_lr_start
        config.model.warmup.lr.end = cfg.warmup_lr_end
        config.model.split_train.enable = cfg.split_batch
        config.model.split_train.batch_size = cfg.split_batch_size

        self._trainer = Trainer(config, run_dir=self._log_dir)
        self._trainer.params = self._params
        state = self._trainer.train()
        self._params = state.params
        return state

    # ------------------------------------------------------------ persistence
    def save(self, path: str = "model_weight.msgpack"):
        """Weights export (reference saves whole-model .h5, models/ssd_model.py:405-407)."""
        from flax import serialization

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(self._params)))
        logger.info("Model is saved to %s", path)

    def load(self, path: str = "model_weight.msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            self._params = serialization.from_bytes(self._params, f.read())
        logger.info("Model is loaded from %s", path)

    # -------------------------------------------------------------- accessors
    def get_model(self):
        """The flax module + params (analog of get_tf_model, models/ssd_model.py:413)."""
        return self._model, self._params

    def get_prior_box(self) -> np.ndarray:
        return self._prior_box

    def get_log_dir(self) -> str:
        return self._log_dir

    def get_log_writer(self):
        """TensorBoard writer for this run dir (reference models/ssd_model.py:421-423).
        Created lazily; returns None when tensorflow is unavailable."""
        if getattr(self, "_log_writer", None) is None:
            try:
                import tensorflow as tf

                self._log_writer = tf.summary.create_file_writer(
                    os.path.join(self._log_dir, "tensorboard")
                )
            except ImportError:  # pragma: no cover - tf is in the base image
                self._log_writer = None
        return self._log_writer

    def show_summary(self) -> str:
        """Print + return the per-layer parameter table (reference show_summary =
        Keras model.summary() + plot_model PNG, models/ssd_model.py:398-403; the
        param table is the flax analog, utils/introspect.py)."""
        from ssd_object_detection_tpu.utils.introspect import param_summary

        table = param_summary(self._params)
        print(table)
        return table

    def predict(self, images01, **nms_kwargs):
        """Batched detection on [0,1] RGB images — the inference API the reference
        never had (SURVEY.md section 3.3). The jitted fn is cached per nms_kwargs."""
        from ssd_object_detection_tpu.eval.predict import make_predict_fn

        key = tuple(sorted(nms_kwargs.items()))
        cache = getattr(self, "_predict_fns", None)
        if cache is None:
            cache = self._predict_fns = {}
        if key not in cache:
            cache[key] = make_predict_fn(self._model.apply, self._prior_box, **nms_kwargs)
        return cache[key](self._params, jnp.asarray(images01))

    # ----------------------------------------------------------- visualization
    def visualize_prior_box(self, image_size: Optional[int] = None, max_cells: int = 6):
        from ssd_object_detection_tpu.utils.viz import render_anchor_grid

        return render_anchor_grid(self._prior_box, image_size or self._spec.image_size, max_cells)

    def visualize_dataset(self, batches, max_images: int = 8, label_names=None,
                          label_colors=None):
        """Render encoded training targets back onto their images (reference
        models/ssd_model.py:446-475: decode offsets against the prior box and draw).
        `batches` is any iterable of pipeline batch dicts; returns a list of RGB
        arrays instead of the reference's interactive cv2.imshow loop."""
        from ssd_object_detection_tpu.ops.matching import build_targets
        from ssd_object_detection_tpu.utils.viz import render_targets

        names = label_names or [f"class_{i}" for i in range(self._classes)]
        colors = label_colors or coco_colors()[: self._classes]
        out = []
        for batch in batches:
            t_cls, t_loc, t_mask = build_targets(
                jnp.asarray(batch["gt_cls"]), jnp.asarray(batch["gt_boxes"]),
                jnp.asarray(batch["gt_valid"]), self._prior_box,
            )
            for b in range(batch["image"].shape[0]):
                out.append(render_targets(
                    np.asarray(batch["image"][b]), np.asarray(t_cls[b]),
                    np.asarray(t_loc[b]), np.asarray(t_mask[b]),
                    self._prior_box, names, colors,
                ))
                if len(out) >= max_images:
                    return out
        return out

    def visualize(self, image01, thresh: float = 0.5, label_names=None, label_colors=None):
        """Score-threshold qualitative decode (reference models/ssd_model.py:477-490).

        The jitted forward is cached on first use (like predict()): constructing a
        fresh jax.jit per call would recompile — minutes per call on this platform."""
        from ssd_object_detection_tpu.train.step import make_eval_forward
        from ssd_object_detection_tpu.utils.viz import render_predictions

        fwd = getattr(self, "_visualize_fwd", None)
        if fwd is None:
            fwd = self._visualize_fwd = make_eval_forward(self._model.apply)
        loc, logits = fwd(self._params, jnp.asarray(image01)[None])
        return render_predictions(
            np.asarray(image01), np.asarray(loc[0]), np.asarray(logits[0]),
            self._prior_box,
            label_names or [f"class_{i}" for i in range(self._classes)],
            label_colors or coco_colors()[: self._classes],
            thresh=thresh,
        )
