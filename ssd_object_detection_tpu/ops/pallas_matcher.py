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


def _matcher_kernel(thresh: float, num_real_anchors: int, chunk: int,
                    gt_ref, valid_ref, anchors_ref, gt_out, data_out,
                    iou_scratch, colrm_scratch, agt_scratch):
    """All full-matrix passes run COLUMN-CHUNKED as `fori_loop`s over `chunk`-wide
    `pl.ds` slices: the (G, D) f32 IoU scratch is the only full-width plane, loop
    bodies reuse one (G, chunk) transient, and the column-removal mask lives in a
    VMEM scratch ref so chunk loops can slice it (Mosaic has no value
    dynamic_slice). Without chunking, the masked working copy and the row-id iota
    each add another full (G, D) plane — 29.9 MB at SSD512's 24,576 padded anchors,
    which fails to compile; python-unrolled chunk loops also fail (the stack
    allocator does not reuse transients across unrolled iterations)."""
    gt5 = gt_ref[0]  # (5, G): cxcywh rows + class-id row (as f32)
    gt = gt5[0:4]  # (4, G)
    num_gt = gt.shape[1]
    num_anchors = anchors_ref.shape[1]
    assert num_anchors % chunk == 0
    n_chunks = num_anchors // chunk

    valid_g1 = valid_ref[0].astype(jnp.int32)  # (G, 1)

    # legacy-clamp IoU (reference utils/bbox.py:28-41): side lengths floored at 1e-10
    gx0 = (gt[0] - gt[2] * 0.5)[:, None]
    gy0 = (gt[1] - gt[3] * 0.5)[:, None]
    gx1 = (gt[0] + gt[2] * 0.5)[:, None]
    gy1 = (gt[1] + gt[3] * 0.5)[:, None]

    def build_chunk(c, _):
        anc = anchors_ref[:, pl.ds(c * chunk, chunk)]  # (4, chunk)
        ax0 = (anc[0] - anc[2] * 0.5)[None, :]
        ay0 = (anc[1] - anc[3] * 0.5)[None, :]
        ax1 = (anc[0] + anc[2] * 0.5)[None, :]
        ay1 = (anc[1] + anc[3] * 0.5)[None, :]
        dx = jnp.maximum(jnp.minimum(gx1, ax1) - jnp.maximum(gx0, ax0), 1e-10)
        dy = jnp.maximum(jnp.minimum(gy1, ay1) - jnp.maximum(gy0, ay0), 1e-10)
        inter = dx * dy
        union = (gt[2] * gt[3])[:, None] + (anc[2] * anc[3])[None, :] - inter + 1e-10
        iou = inter / union
        # padded GT rows / padded anchor columns can never win
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (num_gt, chunk), 1) + c * chunk
        iou = jnp.where(valid_g1 > 0, iou, -1.0)
        iou = jnp.where(col_ids < num_real_anchors, iou, -3.0)
        iou_scratch[:, pl.ds(c * chunk, chunk)] = iou
        return 0

    jax.lax.fori_loop(0, n_chunks, build_chunk, 0)
    colrm_scratch[:, :] = jnp.zeros((1, num_anchors), jnp.int32)
    agt_scratch[:, :] = jnp.full((1, num_anchors), -1, jnp.int32)

    num_valid = jnp.sum(valid_g1)

    # Everything below stays 2-D: Mosaic's vector layouts reject 1-D<->2-D reshapes
    # (and most 1-D bool ops), so masks are (G, 1)/(1, D) int32 and scalar extraction
    # goes through min-index-of-max reductions instead of argmax on 1-D vectors.
    row_iota_g1 = jax.lax.broadcasted_iota(jnp.int32, (num_gt, 1), 0)
    col_iota_1d = jax.lax.broadcasted_iota(jnp.int32, (1, num_anchors), 1)

    # phase 1: greedy global argmax over the masked matrix, consuming the winning
    # row AND column each step (column removal mutates colrm_scratch); the IoU
    # scratch itself stays immutable because phase 2 needs the matched GTs' rows
    # intact (reference zeroes rows only in the working COPY, utils/bbox.py:65-66,
    # and columns in both :66-68)
    def phase1_body(_, row_rm):  # (G,1) int32; col-removal + matches live in refs

        def rowmax_chunk(c, acc):
            work = jnp.where(
                (row_rm + colrm_scratch[:, pl.ds(c * chunk, chunk)]) > 0,
                -2.0,
                iou_scratch[:, pl.ds(c * chunk, chunk)],
            )
            return jnp.maximum(acc, jnp.max(work, axis=1, keepdims=True))

        row_max = jax.lax.fori_loop(
            0, n_chunks, rowmax_chunk, jnp.full((num_gt, 1), -2.0)
        )
        gmax = jnp.max(row_max)
        row = jnp.min(jnp.where(row_max == gmax, row_iota_g1, num_gt))  # lowest row
        # dynamic row read goes through the ref (Mosaic has no value dynamic_slice);
        # the winning row is never row-removed, so only the column mask applies
        best_row = jnp.where(
            colrm_scratch[:, :] > 0, -2.0, iou_scratch[pl.ds(row, 1), :]
        )  # (1, D)
        cmax = jnp.max(best_row)
        col = jnp.min(jnp.where(best_row == cmax, col_iota_1d, num_anchors))  # lowest col
        colrm_scratch[:, :] = jnp.maximum(
            colrm_scratch[:, :], (col_iota_1d == col).astype(jnp.int32)
        )
        agt_scratch[:, :] = jnp.where(col_iota_1d == col, row, agt_scratch[:, :])
        return jnp.maximum(row_rm, (row_iota_g1 == row).astype(jnp.int32))

    jax.lax.fori_loop(0, num_valid, phase1_body, jnp.zeros((num_gt, 1), jnp.int32))

    # phase 2: per-anchor best GT with IoU strictly > thresh, on columns phase 1 did
    # not consume; rows are intentionally NOT excluded (one GT may own many anchors).
    # Then gather matched box + class IN-KERNEL as a one-hot matmul (MXU): XLA-level
    # take_along_axis gathers cost ~3.3 ms/step at batch 32 (profiled); the chunked
    # (5, G) x (G, chunk) matmuls are microseconds.
    def phase2_chunk(c, _):
        s = pl.ds(c * chunk, chunk)
        work = jnp.where(colrm_scratch[:, s] > 0, -2.0, iou_scratch[:, s])
        col_best = jnp.max(work, axis=0, keepdims=True)  # (1, chunk)
        row_iota_gc = jax.lax.broadcasted_iota(jnp.int32, (num_gt, chunk), 0)
        col_row = jnp.min(
            jnp.where(work == col_best, row_iota_gc, num_gt), axis=0, keepdims=True
        )  # (1, chunk): lowest row among per-column ties
        prior = agt_scratch[:, s]
        hit = (prior < 0) & (col_best > thresh)
        final_gt = jnp.where(hit, col_row, prior)  # (1, chunk)
        gt_out[0, :, s] = final_gt
        onehot = ((row_iota_gc == final_gt) & (final_gt >= 0)).astype(jnp.float32)
        # precision=HIGHEST: the MXU multiplies in bf16 by default, which would
        # round the matched box coordinates by ~2^-9 (measured 4e-3 decode error
        # on-chip). The 3-pass f32 emulation is exact here — the f32 operand's
        # hi/mid/lo bf16 split recombines exactly against 0/1 one-hot weights —
        # and costs microseconds at (5, G) x (G, chunk).
        data_out[0, :, s] = jnp.dot(
            gt5, onehot, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, phase2_chunk, 0)


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
    # chunk the kernel's full-matrix passes when three (G, D) f32 planes would not
    # fit VMEM (SSD512: 24,576 padded anchors); the IoU scratch stays full-width
    if 3 * max_gt * d_pad * 4 > (12 << 20):
        # budget: 16 MB - (G, D) f32 scratch - double-buffered outputs leaves ~5 MB
        # for per-chunk transients (~4 live (G, chunk) planes)
        chunk = 2048
        d_pad = int(np.ceil(num_anchors / chunk) * chunk)
    else:
        chunk = d_pad

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

    kernel = partial(_matcher_kernel, float(thresh), num_anchors, chunk)
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
        scratch_shapes=[
            pltpu.VMEM((max_gt, d_pad), jnp.float32),
            pltpu.VMEM((1, d_pad), jnp.int32),  # column-removal mask
            pltpu.VMEM((1, d_pad), jnp.int32),  # per-anchor matched-GT index
        ],
        interpret=interpret,
    )(gt_t, valid_i, anchors_t)
    anchor_gt = anchor_gt[:, 0, :num_anchors]
    data = data[:, :, :num_anchors]

    mask = anchor_gt >= 0
    matched_box = jnp.transpose(data[:, 0:4, :], (0, 2, 1))  # (B, D, 4)
    matched_cls = data[:, 4, :].astype(jnp.int32)
    return MatchResult(cls=matched_cls, box=matched_box, mask=mask, gt_index=anchor_gt)
