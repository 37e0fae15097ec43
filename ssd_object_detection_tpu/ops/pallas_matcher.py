"""Pallas TPU kernel for the greedy anchor matcher (hot op of the train step).

The XLA formulation (ops/matching.py) re-reads the (G, D) IoU matrix from HBM on every
sequential greedy step — ~6 ms per batch-32 step at G=16, worse at G=100. This kernel
computes the IoU matrix INSIDE VMEM (inputs are just gt (4, G) + anchors (4, D) +
validity) and runs the whole two-phase greedy loop on-chip:

  grid = (batch,); per image:
    1. build the legacy-clamp IoU matrix (G, D) in VMEM scratch (~3.5 MB at G=100,
       D=8832 — comfortably inside the 16 MB VMEM budget);
    2. phase 1: `num_valid` greedy iterations (dynamic `fori_loop` bound), each a
       full-matrix argmax + rank-1 mask update — all VPU work on VMEM-resident data;
    3. phase 2: per-anchor argmax over rows with IoU > thresh on unmatched columns.

The greedy argmax picks ties exactly like the reference's flat row-major
np.unravel_index(np.argmax(...)) (utils/bbox.py:64,72): two-stage — lowest row among
max-valued rows, then lowest column within that row.

Semantics match ops/matching.match_anchors for non-degenerate boxes (verified by
tests/test_pallas_matcher.py against the XLA path and the reference-oracle cases).

Layouts: boxes come in TRANSPOSED, (4, G) and (4, D), so each coordinate is a
lane-contiguous row; D is padded to a multiple of 128 by the wrapper (padded anchor
columns are masked to -3 so they can never match).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssd_object_detection_tpu.ops.matching import MatchResult


def _matcher_kernel(thresh: float, num_real_anchors: int,
                    gt_ref, valid_ref, anchors_ref, gt_out, data_out, iou_scratch):
    gt5 = gt_ref[0]  # (5, G): cxcywh rows + class-id row (as f32)
    gt = gt5[0:4]  # (4, G)
    anc = anchors_ref[:, :]  # (4, D)
    num_gt = gt.shape[1]
    num_anchors = anc.shape[1]

    # legacy-clamp IoU (reference utils/bbox.py:28-41): side lengths floored at 1e-10
    gx0 = (gt[0] - gt[2] * 0.5)[:, None]
    gy0 = (gt[1] - gt[3] * 0.5)[:, None]
    gx1 = (gt[0] + gt[2] * 0.5)[:, None]
    gy1 = (gt[1] + gt[3] * 0.5)[:, None]
    ax0 = (anc[0] - anc[2] * 0.5)[None, :]
    ay0 = (anc[1] - anc[3] * 0.5)[None, :]
    ax1 = (anc[0] + anc[2] * 0.5)[None, :]
    ay1 = (anc[1] + anc[3] * 0.5)[None, :]
    dx = jnp.maximum(jnp.minimum(gx1, ax1) - jnp.maximum(gx0, ax0), 1e-10)
    dy = jnp.maximum(jnp.minimum(gy1, ay1) - jnp.maximum(gy0, ay0), 1e-10)
    inter = dx * dy
    union = (gt[2] * gt[3])[:, None] + (anc[2] * anc[3])[None, :] - inter + 1e-10
    iou = inter / union

    # Everything below stays 2-D: Mosaic's vector layouts reject 1-D<->2-D reshapes
    # (and most 1-D bool ops), so masks are (G, 1)/(1, D) int32 and scalar extraction
    # goes through min-index-of-max reductions instead of argmax on 1-D vectors.
    valid_g1 = valid_ref[0].astype(jnp.int32)  # (G, 1)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (num_gt, num_anchors), 1)
    iou = jnp.where(valid_g1 > 0, iou, -1.0)  # padded GT rows never win
    iou = jnp.where(col_ids < num_real_anchors, iou, -3.0)  # padded anchor cols never win
    iou_scratch[:, :] = iou

    num_valid = jnp.sum(valid_g1)

    row_iota_g1 = jax.lax.broadcasted_iota(jnp.int32, (num_gt, 1), 0)
    col_iota_1d = jax.lax.broadcasted_iota(jnp.int32, (1, num_anchors), 1)
    row_iota_gd = jax.lax.broadcasted_iota(jnp.int32, (num_gt, num_anchors), 0)

    # phase 1: greedy global argmax over the masked matrix, consuming the winning
    # row AND column each step; the IoU scratch itself stays immutable because
    # phase 2 needs the matched GTs' rows intact (reference zeroes rows only in the
    # working COPY, utils/bbox.py:65-66, and columns in both :66-68)
    def phase1_body(_, carry):
        row_rm, col_rm, anchor_gt = carry  # (G,1), (1,D), (1,D) int32
        work = jnp.where((row_rm + col_rm) > 0, -2.0, iou_scratch[:, :])
        row_max = jnp.max(work, axis=1, keepdims=True)  # (G, 1)
        gmax = jnp.max(row_max)
        row = jnp.min(jnp.where(row_max == gmax, row_iota_g1, num_gt))  # lowest row
        # dynamic row read goes through the ref (Mosaic has no value dynamic_slice);
        # the winning row is never row-removed, so only the column mask applies
        best_row = jnp.where(col_rm > 0, -2.0, iou_scratch[pl.ds(row, 1), :])  # (1, D)
        cmax = jnp.max(best_row)
        col = jnp.min(jnp.where(best_row == cmax, col_iota_1d, num_anchors))  # lowest col
        return (
            jnp.maximum(row_rm, (row_iota_g1 == row).astype(jnp.int32)),
            jnp.maximum(col_rm, (col_iota_1d == col).astype(jnp.int32)),
            jnp.where(col_iota_1d == col, row, anchor_gt),
        )

    init = (
        jnp.zeros((num_gt, 1), jnp.int32),
        jnp.zeros((1, num_anchors), jnp.int32),
        jnp.full((1, num_anchors), -1, dtype=jnp.int32),
    )
    _, col_rm, anchor_gt = jax.lax.fori_loop(0, num_valid, phase1_body, init)

    # phase 2: per-anchor best GT with IoU strictly > thresh, on columns phase 1 did
    # not consume; rows are intentionally NOT excluded (one GT may own many anchors).
    work = jnp.where(col_rm > 0, -2.0, iou_scratch[:, :])
    col_best = jnp.max(work, axis=0, keepdims=True)  # (1, D)
    col_row = jnp.min(
        jnp.where(work == col_best, row_iota_gd, num_gt), axis=0, keepdims=True
    )  # (1, D): lowest row among per-column ties
    hit = (anchor_gt < 0) & (col_best > thresh)
    final_gt = jnp.where(hit, col_row, anchor_gt)  # (1, D)
    gt_out[0] = final_gt

    # gather matched box + class IN-KERNEL as a one-hot matmul (MXU): the XLA-level
    # take_along_axis gathers cost ~3.3 ms/step at batch 32 (profiled), the (5, G) x
    # (G, D) matmul is microseconds
    onehot = ((row_iota_gd == final_gt) & (final_gt >= 0)).astype(jnp.float32)  # (G, D)
    data_out[0] = jnp.dot(gt5, onehot, preferred_element_type=jnp.float32)  # (5, D)


@partial(jax.jit, static_argnames=("thresh", "interpret"))
def match_anchors_pallas(
    gt_cls: jnp.ndarray,  # (B, G) int32
    gt_boxes: jnp.ndarray,  # (B, G, 4) cxcywh
    gt_valid: jnp.ndarray,  # (B, G) bool
    anchors: jnp.ndarray,  # (D, 4)
    thresh: float = 0.5,
    interpret: bool = False,
) -> MatchResult:
    """Batched greedy matching on TPU via the VMEM-resident Pallas kernel.

    Drop-in batched equivalent of vmap(ops.matching.match_anchors). `interpret=True`
    runs the kernel in interpreter mode (for CPU tests).
    """
    batch, max_gt = gt_cls.shape
    num_anchors = anchors.shape[0]
    d_pad = int(np.ceil(num_anchors / 128) * 128)

    anchors_t = jnp.zeros((4, d_pad), jnp.float32).at[:, :num_anchors].set(
        jnp.asarray(anchors, jnp.float32).T
    )
    # rows 0-3: cxcywh; row 4: class id as f32 (exact for ids < 2^24)
    gt_t = jnp.concatenate(
        [
            jnp.transpose(gt_boxes.astype(jnp.float32), (0, 2, 1)),
            gt_cls.astype(jnp.float32)[:, None, :],
        ],
        axis=1,
    )  # (B, 5, G)
    valid_i = gt_valid.astype(jnp.int32)[:, :, None]  # (B, G, 1)

    kernel = partial(_matcher_kernel, float(thresh), num_anchors)
    anchor_gt, data = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, 5, max_gt), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, max_gt, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((4, d_pad), lambda b: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, d_pad), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 5, d_pad), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, 1, d_pad), jnp.int32),
            jax.ShapeDtypeStruct((batch, 5, d_pad), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((max_gt, d_pad), jnp.float32)],
        interpret=interpret,
    )(gt_t, valid_i, anchors_t)
    anchor_gt = anchor_gt[:, 0, :num_anchors]
    data = data[:, :, :num_anchors]

    mask = anchor_gt >= 0
    matched_box = jnp.transpose(data[:, 0:4, :], (0, 2, 1))  # (B, D, 4)
    matched_cls = data[:, 4, :].astype(jnp.int32)
    return MatchResult(cls=matched_cls, box=matched_box, mask=mask, gt_index=anchor_gt)
