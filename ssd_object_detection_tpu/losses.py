"""MultiBox loss with hard-negative mining, as a pure jitted function.

Replicates the reference `_ssd_loss` (models/ssd_model.py:341-396) semantics exactly in
`reference` mode:

  - positive cls loss: sparse softmax CE at matched anchors, mean over positives (:356-358);
  - hard-negative mining: CE of EVERY anchor against the background class
    (background == LAST channel, n_class-1, :364-365), masked to negatives, threshold =
    the (3*num_positive)-th largest value over the ENTIRE FLATTENED BATCH (:368-372),
    negatives = {loss >= threshold}, mean over mined negatives (:378-380) — note ties at
    the threshold admit MORE than 3*num_positive negatives, as in the reference;
  - loc loss: PLAIN L1 (not smooth-L1, :384-386), summed over the 4 coords, mean over
    positives;
  - total = unweighted sum (:396).

Deviations (by necessity or as guarded totality — the reference would crash):
  - num_positive == 0: reference top_k(0) then [-1] crashes; here every term is 0.
  - the dynamic top-k threshold is computed via a full descending sort + dynamic gather
    (XLA needs static shapes; k = 3*num_positive is data-dependent);
  - the mined-negative set additionally intersects the negative mask, which is
    bit-identical whenever the reference's own pos/neg-disjoint assertion would pass
    (CE > 0 for positives' masked-out zeros).

`canonical` mode (config `model.loss.canonical: true`) implements the SSD-paper loss:
smooth-L1 loc, per-image (not batch-global) 3:1 mining via ranking, same background
convention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossInfo(NamedTuple):
    """Scalar diagnostics, keyed like the reference's TensorBoard tags."""

    total: jnp.ndarray
    loc: jnp.ndarray
    cls_pos: jnp.ndarray
    cls_neg: jnp.ndarray
    num_positive: jnp.ndarray


def _softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Sparse softmax cross-entropy, stable, float32.

    The label logit is extracted with a one-hot reduction instead of
    take_along_axis: gathers over the (anchors, classes) layout lower poorly on TPU
    (measured ~4 ms at (32, 8732, 81)), while the one-hot multiply-sum fuses into the
    logsumexp pass on the VPU.
    """
    logits = logits.astype(jnp.float32)
    log_z = jax.nn.logsumexp(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    label_logit = jnp.sum(logits * onehot, axis=-1)
    return log_z - label_logit


def multibox_loss(
    gt_cls: jnp.ndarray,  # (B, D) int32
    gt_loc: jnp.ndarray,  # (B, D, 4) encoded offsets
    gt_mask: jnp.ndarray,  # (B, D) bool positives
    pred_loc: jnp.ndarray,  # (B, D, 4)
    pred_logits: jnp.ndarray,  # (B, D, C), background last
    neg_pos_ratio: float = 3.0,
    canonical: bool = False,
) -> LossInfo:
    num_classes = pred_logits.shape[-1]
    pos = gt_mask.astype(jnp.float32)
    num_pos = jnp.sum(pos)
    safe_pos = jnp.maximum(num_pos, 1.0)

    # positive classification loss
    ce_pos = _softmax_ce(pred_logits, gt_cls) * pos
    loss_cls_pos = jnp.sum(ce_pos) / safe_pos

    # background CE for every anchor, masked to negatives. Background is the LAST
    # channel (reference :364-365) — a static index, so no gather at all:
    # CE(bg) = logsumexp(logits) - logits[..., -1].
    logits32 = pred_logits.astype(jnp.float32)
    ce_bg = (jax.nn.logsumexp(logits32, axis=-1) - logits32[..., -1]) * (1.0 - pos)

    if canonical:
        # per-image mining: keep the top (ratio * per-image positives) negatives by
        # ranking each image's negative losses (SSD paper sec. 3.1)
        num_pos_img = jnp.sum(pos, axis=1)  # (B,)
        num_neg_img = jnp.minimum(neg_pos_ratio * num_pos_img, pos.shape[1] - num_pos_img)
        order = jnp.argsort(-ce_bg, axis=1)
        rank = jnp.argsort(order, axis=1).astype(jnp.float32)
        neg_mask = (rank < num_neg_img[:, None]) & ~gt_mask
    else:
        # batch-global mining (reference models/ssd_model.py:368-372)
        flat = ce_bg.reshape(-1)
        k = (neg_pos_ratio * num_pos).astype(jnp.int32)
        k = jnp.clip(k, 0, flat.shape[0])
        sorted_desc = -jnp.sort(-flat)
        thresh = sorted_desc[jnp.maximum(k - 1, 0)]
        neg_mask = (ce_bg >= thresh) & ~gt_mask & (k > 0)

    neg = neg_mask.astype(jnp.float32)
    loss_cls_neg = jnp.sum(ce_bg * neg) / jnp.maximum(jnp.sum(neg), 1.0)

    # localization loss over positives
    diff = pred_loc.astype(jnp.float32) - gt_loc
    if canonical:
        absd = jnp.abs(diff)
        per_coord = jnp.where(absd < 1.0, 0.5 * absd * absd, absd - 0.5)  # smooth-L1
    else:
        per_coord = jnp.abs(diff)  # plain L1 (reference :384-386)
    loss_loc = jnp.sum(jnp.sum(per_coord, axis=-1) * pos) / safe_pos

    has_pos = (num_pos > 0).astype(jnp.float32)
    loss_cls_pos = loss_cls_pos * has_pos
    loss_loc = loss_loc * has_pos

    total = loss_loc + loss_cls_pos + loss_cls_neg
    return LossInfo(
        total=total,
        loc=loss_loc,
        cls_pos=loss_cls_pos,
        cls_neg=loss_cls_neg,
        num_positive=num_pos,
    )
