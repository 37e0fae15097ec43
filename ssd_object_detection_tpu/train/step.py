"""The jitted SSD train step: targets + forward + loss + grads + update, all on device.

Re-architecture of the reference's eager `_train_step` (models/ssd_model.py:229-287):
one XLA program per optimizer containing
  normalize -> on-device anchor matching (ops/matching.py) -> offset encoding
  -> forward -> MultiBox loss -> backward -> per-tensor clip -> micro-batch
  accumulation (lax.scan) -> optimizer update.

The reference pays a host round-trip per micro-batch (its loss calls .numpy(),
models/ssd_model.py:388-394) and runs python-loop gradient accumulation; here the
micro-batch split (`split_train` in config, reference config/default.yml:40-42) is a
`lax.scan` inside the same jit, and metrics leave the device once per step.

Clipping semantics follow the reference exactly: each micro-batch gradient tensor is
clip_by_norm'd to 0.01 BEFORE summation, then the sum is divided by the number of
micro-batches and applied once (models/ssd_model.py:248-260).

Under a data-parallel mesh the same jitted function runs SPMD: inputs arrive
batch-sharded, XLA inserts the gradient all-reduce over ICI, and the loss's
batch-global hard-negative top-k stays global because the sort happens on the logical
(unsharded) shape — see parallel/mesh.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ssd_object_detection_tpu.losses import LossInfo, multibox_loss
from ssd_object_detection_tpu.ops.augment import AugConfig, augment_batch
from ssd_object_detection_tpu.ops.matching import build_targets, default_use_pallas
from ssd_object_detection_tpu.train.optim import clip_by_norm_per_tensor


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static knobs baked into the compiled step."""

    match_thresh: float = 0.5  # reference Config.thresh (models/ssd_model.py:48)
    neg_pos_ratio: float = 3.0
    canonical_loss: bool = False
    variances: Optional[Tuple[float, float]] = None
    clip_norm: float = 0.01  # reference models/ssd_model.py:249
    accum_steps: int = 1  # split_train: batch_size // split_batch_size
    # None = auto: the Pallas matcher kernel on TPU (single-chip directly; under a
    # mesh via jax.shard_map over the batch axis — see ops/matching.build_targets),
    # the XLA matcher on CPU/GPU
    use_pallas_matcher: Optional[bool] = None
    # interpreter-mode pallas (CPU tests of the mesh path)
    pallas_interpret: bool = False
    # donate the TrainState buffers to the step (params + opt state are consumed and
    # rewritten every step; donation avoids a full copy). Off by default because
    # donated states cannot be reused by the caller (e.g. test fixtures).
    donate_state: bool = False
    # On-device augmentation (ops/augment.py) applied to the whole batch INSIDE
    # the compiled step, before target building — photometric/expand/crop/flip as
    # one affine resample. None = off. Randomness derives from
    # fold_in(PRNGKey(aug_seed), state.step): deterministic per step, no host rng
    # feed, and identical across data-parallel replicas of the same global step
    # (each replica still augments ITS OWN shard differently because the key is
    # split per image after batch sharding).
    augment: Optional[AugConfig] = None
    aug_seed: int = 0


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def make_train_step(
    apply_fn: Callable,
    anchors: jnp.ndarray,
    tx: optax.GradientTransformation,
    cfg: StepConfig = StepConfig(),
    mesh=None,
):
    """Returns train_step(state, batch) -> (state, metrics dict of scalars).

    batch: {"image": (B,S,S,3) float32 in [0,1] OR uint8 in [0,255], "gt_cls":
            (B,G) int32, "gt_boxes": (B,G,4) relative cxcywh, "gt_valid": (B,G)
            bool}. uint8 input is scaled on DEVICE — feeding uint8 cuts the
            host->device batch transfer 4x (data/packed.py stores uint8 anyway;
            over the axon tunnel the f32 feed was the training bottleneck).

    `mesh`: the data-parallel mesh the step will run under, if any. Needed only so
    the Pallas matcher can be kept under multi-chip training (shard_map over the
    batch axis, ops/matching.build_targets); everything else shards via GSPMD
    without knowing the mesh.
    """
    anchors = jnp.asarray(anchors)
    use_pallas = cfg.use_pallas_matcher
    if use_pallas is None:
        use_pallas = default_use_pallas()

    def loss_for_micro(params, image, gt_cls, gt_boxes, gt_valid) -> Tuple[jnp.ndarray, LossInfo]:
        # input arrives [0,1] from the pipeline (or raw uint8, scaled here on
        # device); reference normalizes to [-1,1] right before batching
        # (models/ssd_model.py:214)
        if image.dtype == jnp.uint8:
            image = image.astype(jnp.float32) / 255.0
        image = (image - 0.5) * 2.0
        t_cls, t_loc, t_mask = build_targets(
            gt_cls, gt_boxes, gt_valid, anchors, thresh=cfg.match_thresh,
            variances=cfg.variances, use_pallas=use_pallas,
            mesh=mesh if use_pallas else None, interpret=cfg.pallas_interpret,
        )
        pred_loc, pred_logits = apply_fn(params, image)
        info = multibox_loss(
            t_cls, t_loc, t_mask, pred_loc, pred_logits,
            neg_pos_ratio=cfg.neg_pos_ratio, canonical=cfg.canonical_loss,
        )
        return info.total, info

    grad_fn = jax.value_and_grad(loss_for_micro, has_aux=True)

    @partial(jax.jit, donate_argnums=(0,) if cfg.donate_state else ())
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if cfg.augment is not None:
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.aug_seed), state.step)
            image, gt_boxes, gt_cls, gt_valid = augment_batch(
                key, batch["image"], batch["gt_boxes"], batch["gt_cls"],
                batch["gt_valid"], cfg.augment,
            )
            batch = {"image": image, "gt_cls": gt_cls,
                     "gt_boxes": gt_boxes, "gt_valid": gt_valid}
        if cfg.accum_steps <= 1:
            (_, info), grads = grad_fn(
                state.params, batch["image"], batch["gt_cls"], batch["gt_boxes"], batch["gt_valid"]
            )
            grads = clip_by_norm_per_tensor(grads, cfg.clip_norm)
        else:
            def split(x):
                return x.reshape((cfg.accum_steps, x.shape[0] // cfg.accum_steps) + x.shape[1:])

            micro = {k: split(v) for k, v in batch.items()}

            def scan_body(acc, mb):
                (_, mb_info), mb_grads = grad_fn(
                    state.params, mb["image"], mb["gt_cls"], mb["gt_boxes"], mb["gt_valid"]
                )
                mb_grads = clip_by_norm_per_tensor(mb_grads, cfg.clip_norm)
                acc_grads, acc_info = acc
                return (
                    jax.tree.map(jnp.add, acc_grads, mb_grads),
                    jax.tree.map(jnp.add, acc_info, mb_info),
                ), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            zero_info = LossInfo(*([jnp.zeros(())] * 5))
            (sum_grads, sum_info), _ = jax.lax.scan(scan_body, (zero_grads, zero_info), micro)
            grads = jax.tree.map(lambda g: g / cfg.accum_steps, sum_grads)
            info = jax.tree.map(lambda x: x / cfg.accum_steps, sum_info)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state)
        metrics = {
            "loss": info.total,
            "loc_loss": info.loc,
            "cls_loss_pos": info.cls_pos,
            "cls_loss_neg": info.cls_neg,
            "num_positive": info.num_positive,
        }
        return new_state, metrics

    return train_step


def make_eval_forward(apply_fn: Callable):
    """Jitted inference forward on [0,1] (or raw uint8) images -> (loc, logits)."""

    @jax.jit
    def forward(params, image):
        if image.dtype == jnp.uint8:
            image = image.astype(jnp.float32) / 255.0
        return apply_fn(params, (image - 0.5) * 2.0)

    return forward
