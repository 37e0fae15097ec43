"""On-device anchor<->ground-truth matching (the reference's #1 host hot loop).

Reference `match_bbox` (utils/bbox.py:44-91) is a host-side greedy bipartite matcher:

  phase 1 — for each of the T ground truths (in descending best-IoU order): take the
    global argmax of a working copy of the TxD IoU matrix, record (gt, anchor), zero
    that row AND column in the copy (so every GT gets exactly one distinct anchor),
    and zero the anchor's column in the main matrix (utils/bbox.py:62-68);
  phase 2 — repeatedly take the global argmax of the main matrix; stop when it drops
    to <= thresh; otherwise record (gt, anchor) and zero the anchor column
    (utils/bbox.py:71-79). Rows are never zeroed, so one GT may own many anchors but
    an anchor is never reused.

TPU re-design: phase 1 becomes a `lax.scan` over max_gt steps (the loop is genuinely
sequential — each pick masks the matrix for the next). Phase 2, however, only ever
zeroes *columns*, so the greedy order is irrelevant: it is exactly equivalent to an
independent per-anchor argmax over GTs with best-IoU > thresh, computed in one
vectorized shot. Ties resolve identically (flat row-major argmax == per-column
lowest-row argmax).

Ground truths arrive padded to a static max_gt with a validity mask (dynamic shapes
don't jit); padded rows are assigned IoU -1 so they can never win an argmax against
real rows (real IoUs are >= 0 under the legacy clamp). Matching the reference, zeroed
entries are set to exactly 0.0, preserving argmax tie-breaking for valid boxes
(w, h > 0).

vmap over the batch dimension composes this into the jitted train step, eliminating the
reference's per-image host matching (SURVEY.md section 3.4).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssd_object_detection_tpu.ops import boxes as box_ops


class MatchResult(NamedTuple):
    """Per-anchor targets, shaped like reference match_bbox's return (utils/bbox.py:84-91)."""

    cls: jnp.ndarray  # (D,) int32, class id of matched GT, 0 where unmatched
    box: jnp.ndarray  # (D, 4) float32, matched GT cxcywh, 0 where unmatched
    mask: jnp.ndarray  # (D,) bool, True where anchor is matched (positive)
    gt_index: jnp.ndarray  # (D,) int32, index of matched GT, -1 where unmatched


def match_anchors(
    gt_cls: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors: jnp.ndarray,
    thresh: float = 0.5,
) -> MatchResult:
    """Match `anchors` (D, 4) against padded GTs (max_gt,) / (max_gt, 4) / (max_gt,).

    Bit-compatible with reference utils/bbox.py:44-91 for valid (positive-size) boxes,
    verified by golden tests ported from reference tests/utils/test_bbox.py:25-45.
    """
    max_gt = gt_boxes.shape[0]
    num_anchors = anchors.shape[0]

    iou = box_ops.pairwise_iou(gt_boxes, anchors, legacy_clamp=True)  # (max_gt, D)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    num_valid = jnp.sum(gt_valid.astype(jnp.int32))

    # Phase 1: sequential greedy, one distinct anchor per valid GT. The IoU matrix is
    # read-only; removal is tracked by (G,)/(D,) masks instead of rewriting two (G, D)
    # matrices per step (the reference zeroes rows/cols in copies, utils/bbox.py:65-68
    # — equivalent for non-degenerate boxes since real legacy-clamp IoUs are strictly
    # positive and masked cells can never win the argmax). A while_loop bounded by the
    # number of VALID GTs (not the static max_gt padding) keeps the sequential scan as
    # short as the data allows.
    def phase1_cond(carry):
        _, _, _, t = carry
        return t < num_valid

    def phase1_step(carry):
        row_removed, col_removed, anchor_gt, t = carry
        masked = jnp.where(row_removed[:, None] | col_removed[None, :], -2.0, iou)
        flat = jnp.argmax(masked)  # row-major ties -> lowest (row, col)
        row = (flat // num_anchors).astype(jnp.int32)
        col = (flat % num_anchors).astype(jnp.int32)
        row_removed = row_removed.at[row].set(True)
        col_removed = col_removed.at[col].set(True)
        anchor_gt = anchor_gt.at[col].set(row)
        return (row_removed, col_removed, anchor_gt, t + 1)

    init = (
        jnp.zeros((max_gt,), bool),
        jnp.zeros((num_anchors,), bool),
        jnp.full((num_anchors,), -1, dtype=jnp.int32),
        jnp.int32(0),
    )
    _, col_removed, anchor_gt, _ = jax.lax.while_loop(phase1_cond, phase1_step, init)

    # Phase 2: per-anchor best remaining GT with IoU strictly > thresh (order-free
    # equivalent of the reference while-loop; see module docstring). Rows are NOT
    # removed in phase 2 (one GT may own many anchors); only phase-1-matched columns
    # are out (reference zeroes those in the main matrix, utils/bbox.py:68).
    col_best = jnp.max(iou, axis=0)
    col_row = jnp.argmax(iou, axis=0).astype(jnp.int32)
    phase2_hit = (anchor_gt < 0) & (col_best > thresh) & ~col_removed
    anchor_gt = jnp.where(phase2_hit, col_row, anchor_gt)

    mask = anchor_gt >= 0
    safe_idx = jnp.maximum(anchor_gt, 0)
    matched_cls = jnp.where(mask, gt_cls[safe_idx].astype(jnp.int32), 0)
    matched_box = jnp.where(mask[:, None], gt_boxes[safe_idx], 0.0)
    return MatchResult(cls=matched_cls, box=matched_box, mask=mask, gt_index=anchor_gt)


@partial(jax.jit, static_argnames=("thresh", "use_pallas", "mesh", "interpret"))
def build_targets(
    gt_cls: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors: jnp.ndarray,
    thresh: float = 0.5,
    variances=None,
    use_pallas: bool = False,
    mesh=None,
    interpret: bool = False,
):
    """Batched match + encode: the device-side replacement for the reference's
    get_train_set target builder (models/ssd_model.py:209-227).

    Args are batched: gt_cls (B, G), gt_boxes (B, G, 4) relative cxcywh, gt_valid (B, G).
    Returns (cls (B, D) int32, loc (B, D, 4) encoded offsets, mask (B, D) bool).

    `use_pallas` selects the VMEM-resident matcher kernel (ops/pallas_matcher.py) —
    4x faster at max_gt=100 on v5e, identical assignments; use
    `default_use_pallas()` to pick it automatically on TPU backends.

    `mesh` (with use_pallas): GSPMD cannot auto-partition `pallas_call`, so under a
    multi-device mesh the kernel is wrapped in `jax.shard_map` over the mesh's
    FIRST axis (the batch/data axis) — every batch row is independent through the
    whole matcher, so each device runs the kernel on its local batch shard and the
    results concatenate exactly. `interpret` runs the kernel in interpreter mode
    (CPU tests).

    Mirroring the reference (models/ssd_model.py:213), the encoder runs over ALL
    anchors including unmatched ones (whose target box is 0); the loss masks them.
    """
    if use_pallas and not pallas_matcher_fits(gt_cls.shape[1], anchors.shape[0]):
        # e.g. SSD512 (24,564 anchors) at max_gt=100: the kernel's live (G, D) f32
        # working set (~30 MB) exceeds the 16 MB VMEM budget -> XLA matcher instead
        use_pallas = False
    if use_pallas and mesh is None and jax.device_count() > 1:
        # GSPMD cannot partition a bare pallas_call; without a mesh to shard_map
        # over, a multi-device run would fail at compile -> XLA matcher instead.
        use_pallas = False
    if use_pallas and mesh is not None and mesh.size > 1:
        n_shards = mesh.shape[mesh.axis_names[0]]
        if gt_cls.shape[0] % n_shards != 0:
            # shard_map needs the (micro-)batch divisible by the data axis; e.g.
            # accum_steps can shrink the per-step batch below the mesh width.
            use_pallas = False
    if use_pallas:
        from ssd_object_detection_tpu.ops.pallas_matcher import match_anchors_pallas

        if mesh is not None and mesh.size > 1:
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            matched = jax.shard_map(
                lambda c, b, v, a: match_anchors_pallas(
                    c, b, v, a, thresh, interpret=interpret
                ),
                mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis), P()),
                out_specs=MatchResult(
                    cls=P(axis), box=P(axis), mask=P(axis), gt_index=P(axis)
                ),
                check_vma=False,  # pallas_call has no replication rule
            )(gt_cls, gt_boxes, gt_valid, anchors)
        else:
            matched = match_anchors_pallas(
                gt_cls, gt_boxes, gt_valid, anchors, thresh, interpret=interpret
            )
    else:
        matched = jax.vmap(lambda c, b, v: match_anchors(c, b, v, anchors, thresh))(
            gt_cls, gt_boxes, gt_valid
        )
    loc = box_ops.encode_boxes(matched.box, anchors[None], variances=variances)
    return matched.cls, loc, matched.mask


def default_use_pallas() -> bool:
    """True when the default backend is a TPU (Mosaic kernels don't lower on CPU)."""
    return jax.default_backend() not in ("cpu", "gpu")


def pallas_matcher_fits(max_gt: int, num_anchors: int, budget_bytes: int = 11 << 20) -> bool:
    """Whether the VMEM-resident matcher kernel fits scoped VMEM (16 MB/core).

    The kernel column-chunks every full-matrix pass (ops/pallas_matcher.py), so the
    only full-width buffer is the (G, D_pad) f32 IoU scratch; transients add ~3 MB.
    SSD300 (8,832 padded anchors, G=100) -> 3.5 MB scratch; SSD512 (24,576) ->
    9.8 MB scratch, both fit. The guard protects hypothetical larger variants
    (e.g. >28k anchors at G=100) by falling back to the XLA matcher."""
    d_pad = -(-num_anchors // 4096) * 4096
    return max_gt * d_pad * 4 <= budget_bytes
