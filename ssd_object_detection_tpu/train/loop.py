"""Trainer: warmup + epoch loop, TensorBoard logging, orbax checkpointing, resume.

Re-architecture of the reference training loop (models/ssd_model.py:289-339 and
tools/train.py:22-70):
  - timestamped run dir under model.log_dir (reference :54-55);
  - warmup phase with a SEPARATE optimizer instance + polynomial lr (reference
    :295-311 and TrainConfig defaults :26-28) — separate optax state, exactly like the
    reference's two tf.keras optimizers with independent Adam moments; then the main
    epoch loop restarting at step 0 (reference :313-323);
  - TensorBoard scalars with the reference's tag names every step, prediction/target
    image panels every `log_interval` steps (reference :266-285);
  - per-epoch checkpoints + final save (reference :324, tools/train.py:70) + crash
    save on any exception (reference :336-339), all upgraded from weights-only .h5 to
    orbax checkpoints carrying params + optimizer state + step + phase, enabling
    `--resume` (absent in the reference: SURVEY.md section 5 checkpoint/resume);
  - multi-chip data parallelism over a 1-D mesh when >1 device is available
    (parallel/mesh.py), absent in the reference.

Device efficiency: metrics cross the host boundary once per logged step (the reference
syncs .numpy() per micro-batch, models/ssd_model.py:388-394).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssd_object_detection_tpu.config import Config
from ssd_object_detection_tpu.data.coco import COCO_NAMES, coco_colors, open_split
from ssd_object_detection_tpu.data.pipeline import CocoPipeline, PipelineConfig
from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset
from ssd_object_detection_tpu.models.ssd import MODEL_SPECS, SSD
from ssd_object_detection_tpu.ops.anchors import generate_anchors
from ssd_object_detection_tpu.ops.augment import AugConfig
from ssd_object_detection_tpu.parallel.mesh import make_mesh, replicate
from ssd_object_detection_tpu.train.optim import (
    exponential_decay,
    make_optimizer,
    polynomial_decay,
)
from ssd_object_detection_tpu.train.step import (
    StepConfig,
    TrainState,
    create_train_state,
    make_train_step,
)

logger = logging.getLogger(__name__)

try:  # TensorBoard via tf.summary; fully optional
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    tf.config.set_visible_devices([], "TPU")
except Exception:  # pragma: no cover
    tf = None

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


class _EpochIterable:
    """Adapter giving a make-one-epoch callable the same contract as the stateful
    pipelines (PackedPipeline/CocoPipeline): each __iter__ yields one epoch, and
    any rng captured by the callable advances across epochs."""

    def __init__(self, make_epoch):
        self._make_epoch = make_epoch

    def __iter__(self):
        return iter(self._make_epoch())


class Trainer:
    def __init__(self, config: Config, run_dir: Optional[str] = None):
        self.cfg = config.validate()
        mc = self.cfg.model

        if run_dir is None:
            # reference timestamps the run dir at model init (models/ssd_model.py:54-55)
            stamp = time.strftime("%Y-%m-%d-%H%M%S", time.localtime())
            run_dir = os.path.join(mc.log_dir, stamp)
        self.run_dir = run_dir
        os.makedirs(self.run_dir, exist_ok=True)

        spec = MODEL_SPECS[mc.variant]
        self.spec = spec
        self.num_classes = self.cfg.data.num_classes + 1  # background LAST (ref :47)
        if mc.debug_nans:
            from ssd_object_detection_tpu.utils.debug import enable_nan_debugging

            enable_nan_debugging(True)
        dtype = jnp.bfloat16 if mc.precision == "bfloat16" else jnp.float32
        self.model = SSD(
            num_classes=self.num_classes, spec=spec, dtype=dtype, remat=mc.remat,
            s2d_stem=mc.s2d_stem,
        )
        self.anchors = generate_anchors(spec.anchor_spec)

        # optimizers: main (exp decay) + warmup (polynomial), as tools/train.py:31-53
        tr, wu = mc.train, mc.warmup
        self.main_schedule = exponential_decay(tr.lr.initial, tr.lr.decay_step, tr.lr.decay_rate)
        self.main_tx = make_optimizer(
            tr.optimizer.name, self.main_schedule,
            beta_1=tr.optimizer.beta_1, beta_2=tr.optimizer.beta_2,
            epsilon=tr.optimizer.epsilon, momentum=tr.optimizer.momentum,
        )
        self.warmup_schedule = polynomial_decay(wu.lr.start, wu.step, wu.lr.end)
        self.warmup_tx = make_optimizer(
            wu.optimizer.name, self.warmup_schedule,
            beta_1=wu.optimizer.beta_1, beta_2=wu.optimizer.beta_2,
            epsilon=wu.optimizer.epsilon, momentum=wu.optimizer.momentum,
        )

        accum = (
            tr.batch_size // mc.split_train.batch_size if mc.split_train.enable else 1
        )
        # On-device augmentation (ops/augment.py): when data.augment.device (the
        # default) and any pre-resize augmentation is requested, the whole recipe
        # — INCLUDING flip — runs inside the compiled train step, so the data
        # source stays the fast path (packed cache / memmap reads). Host-side
        # augmentation (device: false) keeps the numpy recipe in the pipeline.
        aug = self.cfg.data.augment
        self._device_augment = aug.device and (aug.expand or aug.crop or aug.photometric)
        step_cfg = StepConfig(
            match_thresh=mc.match_thresh,
            neg_pos_ratio=mc.loss.neg_pos_ratio,
            canonical_loss=mc.loss.canonical,
            variances=mc.loss.variances,
            accum_steps=accum,
            donate_state=True,  # states are linear through the loop; saves HBM
            augment=(
                AugConfig(photometric=aug.photometric, expand=aug.expand,
                          crop=aug.crop, flip=aug.flip)
                if self._device_augment else None
            ),
            aug_seed=self.cfg.data.seed,
        )
        self.step_cfg = step_cfg

        # data-parallel mesh BEFORE the step fns: the step needs the mesh so the
        # Pallas matcher can run under it via shard_map (ops/matching.build_targets).
        # Explicit device count must divide the batch; auto mode (data_parallel: 0)
        # uses the most devices that do.
        n_dp = self.cfg.parallel.data_parallel
        if n_dp:
            n_dp = min(n_dp, jax.device_count())
            assert tr.batch_size % n_dp == 0, (
                f"batch_size {tr.batch_size} must divide over {n_dp} devices"
            )
        else:
            n_dp = jax.device_count()
            while tr.batch_size % n_dp:
                n_dp -= 1
        self.mesh = make_mesh(n_dp) if n_dp > 1 else None
        if self.mesh is not None:
            logger.info("data-parallel over %d devices", n_dp)

        self.main_step = make_train_step(
            self.model.apply, self.anchors, self.main_tx, step_cfg, mesh=self.mesh
        )
        self.warmup_step = make_train_step(
            self.model.apply, self.anchors, self.warmup_tx, step_cfg, mesh=self.mesh
        )

        # init params (optionally from an imported Keras VGG16 .h5 trunk)
        params = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, spec.image_size, spec.image_size, 3))
        )
        if mc.pretrained_vgg:
            if spec.trunk != "vgg16":
                raise ValueError(
                    f"pretrained_vgg is a VGG16 trunk import; variant {mc.variant!r} "
                    f"uses the {spec.trunk!r} trunk"
                )
            from ssd_object_detection_tpu.models.import_keras import load_vgg16_trunk_into

            params = load_vgg16_trunk_into(params, mc.pretrained_vgg)
        self.params = params

        self._train_source = None
        self._tb = None
        if tf is not None:
            self._tb = tf.summary.create_file_writer(os.path.join(self.run_dir, "tensorboard"))

        self._ckpt_mgr = None
        if ocp is not None and mc.checkpoint.enable:
            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.join(os.path.abspath(self.run_dir), "checkpoints"),
                options=ocp.CheckpointManagerOptions(max_to_keep=mc.checkpoint.keep),
            )

        # resolved-config dump + TB text summary (reference tools/train.py:55-58)
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            json.dump(self.cfg.to_dict(), f, sort_keys=True, indent=4, separators=(",", ":"))
        if self._tb is not None:
            with self._tb.as_default(step=0):
                tf.summary.text("config", str(self.cfg.to_dict()))

        if self.cfg.data.dataset == "coco":
            self.class_names, self.class_colors = COCO_NAMES, coco_colors()
        else:
            self.class_names = [f"class_{i}" for i in range(self.cfg.data.num_classes)]
            self.class_colors = coco_colors()[: self.cfg.data.num_classes]

    # ------------------------------------------------------------------ data
    def train_batches(self, epochs: int = 1) -> Iterator[Dict[str, np.ndarray]]:
        """Yield `epochs` epochs of training batches.

        The underlying epoch source is constructed ONCE per Trainer and keeps its
        shuffle/augmentation rng state across calls, so epoch N+1 gets a different
        permutation and different flip coins than epoch N even though train()
        pulls one epoch per call."""
        if self._train_source is None:
            self._train_source = self._make_train_source()
        for _ in range(epochs):
            yield from self._train_source

    def _make_train_source(self):
        """Build the epoch-iterable for the configured dataset (each __iter__ is
        one epoch; the object's rng/epoch state advances across iterations)."""
        d = self.cfg.data
        if d.dataset == "synthetic":
            ds = SyntheticDetectionDataset(
                num_images=d.mini_batch.num_data if d.mini_batch.enable else 256,
                image_size=self.spec.image_size,
                max_gt=min(d.max_gt, 8),
                num_classes=min(self.cfg.data.num_classes, 8),
            )
            order_rng = np.random.default_rng(d.seed)
            return _EpochIterable(lambda: ds.batches(
                self.cfg.model.train.batch_size, epochs=1, shuffle=d.shuffle,
                order_rng=order_rng,
            ))
        index = open_split(
            d.dataset_root, "train",
            mini_batch=d.mini_batch.num_data if d.mini_batch.enable else 0,
        )
        host_aug = (d.augment.expand or d.augment.crop or d.augment.photometric) and (
            not self._device_augment
        )
        if d.packed_cache and host_aug:
            logger.warning(
                "data.packed_cache=%r is IGNORED because HOST expand/crop/"
                "photometric augmentation (data.augment.device: false) needs "
                "original-resolution pixels: training routes through the (much "
                "slower) JPEG-decode pipeline. Set data.augment.device: true to "
                "run the recipe on device and keep the cache.",
                d.packed_cache,
            )
        if self._device_augment:
            logger.info(
                "augmentation runs ON DEVICE inside the train step "
                "(photometric=%s expand=%s crop=%s flip=%s; ops/augment.py)",
                d.augment.photometric, d.augment.expand, d.augment.crop,
                d.augment.flip,
            )
        if d.packed_cache and not host_aug:
            # decode-once cache (data/packed.py): pack on first use, then epochs are
            # memmap reads. Pre-resize augmentation needs original pixels -> decode path.
            from ssd_object_detection_tpu.data.packed import (
                PackedConfig, PackedPipeline, is_packed, pack_dataset, verify_cache,
            )

            if not is_packed(d.packed_cache):
                logger.info("building packed cache at %s ...", d.packed_cache)
                pack_dataset(
                    index, d.packed_cache, image_size=self.spec.image_size,
                    max_gt=d.max_gt, num_workers=d.num_workers,
                )
            else:
                # identity (index digest + transform params) raises on mismatch;
                # a pack-time decode-failure shortfall warns (data/packed.py)
                verify_cache(
                    index, d.packed_cache,
                    image_size=self.spec.image_size, max_gt=d.max_gt,
                )
            return PackedPipeline(
                d.packed_cache,
                PackedConfig(
                    batch_size=self.cfg.model.train.batch_size, shuffle=d.shuffle,
                    # flip moves into the compiled step with device augmentation
                    augment_flip=d.augment.flip and not self._device_augment,
                    seed=d.seed,
                ),
            )
        return CocoPipeline(
            index,
            PipelineConfig(
                image_size=self.spec.image_size,
                max_gt=d.max_gt,
                batch_size=self.cfg.model.train.batch_size,
                shuffle=d.shuffle,
                seed=d.seed,
                num_workers=d.num_workers,
                prefetch=d.prefetch,
                # with device augmentation the host pipeline feeds CLEAN resized
                # images; the whole recipe (incl. flip) runs inside the step
                augment_flip=d.augment.flip and not self._device_augment,
                augment_expand=d.augment.expand and not self._device_augment,
                augment_crop=d.augment.crop and not self._device_augment,
                augment_photometric=d.augment.photometric and not self._device_augment,
            ),
        )

    def val_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        """Validation split (the reference loads one but never consumes it,
        models/ssd_model.py:291)."""
        d = self.cfg.data
        if d.dataset == "synthetic":
            ds = SyntheticDetectionDataset(
                num_images=32, image_size=self.spec.image_size,
                max_gt=min(d.max_gt, 8), num_classes=min(self.cfg.data.num_classes, 8),
                seed=999,
            )
            yield from ds.batches(min(self.cfg.model.train.batch_size, 8))
            return
        index = open_split(
            d.dataset_root, "val",
            mini_batch=d.mini_batch.num_data if d.mini_batch.enable else 0,
        )
        yield from CocoPipeline(
            index,
            PipelineConfig(
                image_size=self.spec.image_size, max_gt=d.max_gt,
                batch_size=self.cfg.model.train.batch_size, shuffle=False,
                num_workers=d.num_workers, prefetch=d.prefetch,
            ),
        )

    def evaluate(
        self,
        params=None,
        max_batches: Optional[int] = None,
        step: int = 0,
    ) -> Dict[str, float]:
        """COCO-style mAP over the validation split (new capability; SURVEY.md: the
        reference has no evaluation). `step` tags the TB `val/*` scalars."""
        from ssd_object_detection_tpu.eval.predict import make_predict_fn
        from ssd_object_detection_tpu.eval.runner import evaluate_batches

        if not hasattr(self, "_eval_predict"):
            self._eval_predict = make_predict_fn(
                self.model.apply, self.anchors, variances=self.step_cfg.variances
            )
        metrics = evaluate_batches(
            self._eval_predict, params if params is not None else self.params,
            self.val_batches(), num_classes=self.cfg.data.num_classes,
            max_batches=max_batches, mesh=self.mesh,
        )
        if self._tb is not None:
            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(f"val/{k}", v, step=step)
        return metrics

    # ------------------------------------------------------------- checkpoint
    def save_checkpoint(self, state: TrainState, tag: int, phase: str) -> None:
        if self._ckpt_mgr is None:
            return
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "phase": np.asarray(0 if phase == "warmup" else 1, np.int32),
        }
        self._ckpt_mgr.save(tag, args=ocp.args.StandardSave(payload))

    def restore_latest(self, state: TrainState, phase: str):
        """Restore (state, resumed_tag) from the newest checkpoint, or (state, None)."""
        if self._ckpt_mgr is None or self._ckpt_mgr.latest_step() is None:
            return state, None
        tag = self._ckpt_mgr.latest_step()
        abstract = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "phase": np.asarray(0, np.int32),
        }
        restored = self._ckpt_mgr.restore(tag, args=ocp.args.StandardRestore(abstract))
        state = TrainState(
            step=jnp.asarray(restored["step"]),
            params=restored["params"],
            opt_state=restored["opt_state"],
        )
        return state, tag

    def export_params(self, params, name: str) -> str:
        """Weights-only export (the analog of the reference's .h5 model files)."""
        from flax import serialization

        path = os.path.join(self.run_dir, name if name.endswith(".msgpack") else name + ".msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        logger.info("params exported to %s", path)
        return path

    def load_params(self, path: str):
        """Replace the trainer's params with an exported msgpack file — the analog of
        the reference's model.load() (models/ssd_model.py:409-411)."""
        from flax import serialization

        with open(path, "rb") as f:
            self.params = serialization.from_bytes(self.params, f.read())
        logger.info("params loaded from %s", path)
        return self.params

    # ------------------------------------------------------------------ logging
    def _log_scalars(self, stage: str, metrics: Dict, lr: float, step: int) -> None:
        if self._tb is None:
            return
        with self._tb.as_default():
            # reference tag names (models/ssd_model.py:281-285)
            tf.summary.scalar(stage + "/loc loss", float(metrics["loc_loss"]), step=step)
            tf.summary.scalar(stage + "/cls loss pos", float(metrics["cls_loss_pos"]), step=step)
            tf.summary.scalar(stage + "/cls loss neg", float(metrics["cls_loss_neg"]), step=step)
            tf.summary.scalar(stage + "/loss", float(metrics["loss"]), step=step)
            tf.summary.scalar(stage + "/lr", lr, step=step)

    def _log_images(self, stage: str, batch: Dict, state: TrainState, step: int) -> None:
        if self._tb is None:
            return
        from ssd_object_detection_tpu.ops.matching import build_targets
        from ssd_object_detection_tpu.train.step import make_eval_forward
        from ssd_object_detection_tpu.utils import viz

        image01 = np.asarray(batch["image"][0])
        if image01.dtype == np.uint8:
            image01 = image01.astype(np.float32) / 255.0
        if not hasattr(self, "_fwd"):
            self._fwd = make_eval_forward(self.model.apply)
        loc, logits = self._fwd(state.params, batch["image"][:1])
        pred_img = viz.render_predictions(
            image01, np.asarray(loc[0]), np.asarray(logits[0]), self.anchors,
            self.class_names, self.class_colors, thresh=0.3,
        )
        t_cls, t_loc, t_mask = build_targets(
            batch["gt_cls"][:1], batch["gt_boxes"][:1], batch["gt_valid"][:1],
            self.anchors, thresh=self.step_cfg.match_thresh, variances=self.step_cfg.variances,
        )
        gt_img = viz.render_targets(
            image01, np.asarray(t_cls[0]), np.asarray(t_loc[0]), np.asarray(t_mask[0]),
            self.anchors, self.class_names, self.class_colors,
        )
        # predictions rendered at GT-positive anchors (reference pred_with_mask panel,
        # models/ssd_model.py:270-273)
        probs = np.exp(np.asarray(logits[0], np.float64))
        probs /= probs.sum(-1, keepdims=True)
        pred_mask_img = viz.render_targets(
            image01, probs[:, :-1].argmax(-1), np.asarray(loc[0]), np.asarray(t_mask[0]),
            self.anchors, self.class_names, self.class_colors,
            scores=probs[:, :-1].max(-1),
        )
        with self._tb.as_default():
            tf.summary.image(stage + "/pred", pred_img[None], step=step)
            tf.summary.image(stage + "/pred_with_mask", pred_mask_img[None], step=step)
            tf.summary.image(stage + "/gt", gt_img[None], step=step)

    # ------------------------------------------------------------------ train
    def _run_phase(
        self,
        stage: str,
        state: TrainState,
        step_fn,
        schedule,
        batches: Iterator[Dict[str, np.ndarray]],
        max_steps: Optional[int] = None,
        log_every: Optional[int] = None,
    ) -> TrainState:
        from ssd_object_detection_tpu.parallel.mesh import device_prefetch

        mc = self.cfg.model
        if log_every is None:
            # reference logs scalars every step (models/ssd_model.py:281-285); each log
            # is a device->host fetch, so high-latency links may want this larger
            log_every = max(mc.log_scalar_interval, 1)
        step = int(state.step)

        host_side = []

        def tee(src):
            for b in src:
                host_side.append(b)
                yield {k: b[k] for k in ("image", "gt_cls", "gt_boxes", "gt_valid")}

        # tqdm epoch bar with live loss postfix (reference models/ssd_model.py:298-322);
        # the postfix refreshes only at log_every so the bar never forces extra
        # device->host syncs
        bar = None
        if mc.progress_bar:
            try:
                from tqdm import tqdm

                bar = tqdm(desc=stage, total=max_steps, initial=step, unit="step")
            except ImportError:  # pragma: no cover
                bar = None

        try:
            # device_prefetch overlaps H2D transfer of the next `device_prefetch`
            # batches with compute of batch N (depth 2 default: feed-bound hosts)
            for jbatch in device_prefetch(
                tee(batches), self.mesh, depth=self.cfg.data.device_prefetch
            ):
                batch = host_side.pop(0)
                state, metrics = step_fn(state, jbatch)
                # keep the freshest live state for the crash-save path: with
                # donate_state=True the PREVIOUS state's buffers are gone
                self._last_state = state
                step += 1
                if step % log_every == 0:
                    lr = float(schedule(step))
                    fetched = jax.device_get(metrics)
                    self._log_scalars(stage, fetched, lr, step)
                    if bar is not None:
                        bar.set_postfix(loss=f"{float(fetched['loss']):.4f}", refresh=False)
                if bar is not None:
                    bar.update(1)
                if mc.log_interval and step % mc.log_interval == 0:
                    self._log_images(stage, batch, state, step)
                if max_steps is not None and step >= max_steps:
                    break
        finally:
            if bar is not None:
                bar.close()
        return state

    def train(self) -> TrainState:
        mc = self.cfg.model
        state = create_train_state(self.params, self.main_tx)
        start_epoch = 0
        skip_warmup = False

        if mc.checkpoint.resume:
            state, tag = self.restore_latest(state, "train")
            if tag is not None:
                start_epoch = tag
                skip_warmup = True
                logger.info("resumed from checkpoint %s (step %d)", tag, int(state.step))

        if self.mesh is not None:
            state = replicate(state, self.mesh)

        try:
            if mc.warmup.enable and not skip_warmup:
                logger.info("warmup for %d steps", mc.warmup.step)
                wstate = create_train_state(state.params, self.warmup_tx)
                if self.mesh is not None:
                    wstate = replicate(wstate, self.mesh)
                # reference loops the dataset until warmup_step is reached (:299-311)
                while int(wstate.step) < mc.warmup.step:
                    before = int(wstate.step)
                    wstate = self._run_phase(
                        "warmup", wstate, self.warmup_step, self.warmup_schedule,
                        self.train_batches(epochs=1), max_steps=mc.warmup.step,
                    )
                    if int(wstate.step) == before:
                        raise RuntimeError(
                            "warmup made no progress: the dataset produced no batches "
                            f"(batch_size {mc.train.batch_size} larger than the dataset?)"
                        )
                # main optimizer starts fresh on warmed-up params (reference :313)
                state = create_train_state(wstate.params, self.main_tx)
                if self.mesh is not None:
                    state = replicate(state, self.mesh)

            for epoch in range(start_epoch, mc.train.epoch):
                logger.info("epoch %d/%d", epoch + 1, mc.train.epoch)
                state = self._run_phase(
                    "train", state, self.main_step, self.main_schedule,
                    self.train_batches(epochs=1),
                )
                self.save_checkpoint(state, epoch + 1, "train")
                if mc.eval_every and (epoch + 1) % mc.eval_every == 0:
                    # in-training validation (the reference loads a val set but never
                    # consumes it, models/ssd_model.py:291): TB `val/*` scalars
                    metrics = self.evaluate(params=state.params, step=int(state.step))
                    logger.info("epoch %d val: %s", epoch + 1, metrics)
        except Exception:
            # reference saves error_exit_save.h5 then re-raises (:336-339); prefer the
            # freshest live state (donation deletes superseded buffers)
            live = getattr(self, "_last_state", state)
            try:
                crash_path = self.export_params(live.params, "error_exit_save")
                logger.critical("error during training; params saved to %s", crash_path)
            except Exception:  # pragma: no cover - never mask the original error
                logger.critical("error during training; crash save also failed")
            raise

        self.export_params(state.params, mc.save.replace(".h5", ""))
        if self._ckpt_mgr is not None:
            self._ckpt_mgr.wait_until_finished()
        return state
