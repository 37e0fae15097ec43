"""Pallas TPU kernel: fused 3x3 SAME conv + bias + relu (+ optional 2x2 max-pool).

Why hand-write a conv when XLA has one: profiling the SSD300 forward on v5e
(BASELINE.md round 2) shows XLA's spatial convolutions in the VGG trunk running at
12-25% MFU — e.g. block1_conv2 (300x300, 64->64) at 2.76 ms where the MXU floor is
~1.0 ms, plus a separate 1.6 ms max-pool that re-reads the 368 MB activation from
HBM. This kernel restructures the op for the hardware:

  - one HBM read of the input, one HBM write of the (pooled) output; bias, relu and
    the 2x2 pool happen in VMEM, so the pool's full-resolution HBM round-trip
    disappears;
  - the 3x3 is computed as THREE MXU GEMMs (one per input-row shift ky) against a
    (3*IC, 3*OC) stacked weight whose N axis carries the 3 column shifts kx; the
    column shifts are then applied to the GEMM OUTPUT by two shifted adds on the
    VPU. No im2col is ever materialized (9x traffic amplification avoided), and the
    contraction is K=IC per GEMM with all 9 taps covered;
  - SAME padding needs no padded copy of the input: top/bottom halo rows arrive as
    separate 1-row BlockSpecs with clamped index maps (zeroed in-kernel at the
    image border), and the left/right column edges fall out of the output-shift
    accumulation (a missing shifted column IS the zero-pad contribution).

Autodiff: pallas_call has no VJP, so `conv3x3_bias_relu` carries a custom_vjp whose
backward is the vjp of an equivalent XLA implementation — gradients are exact and
training works, only the forward is hand-scheduled.

Note GSPMD does not auto-partition pallas_call (see ops/pallas_matcher.py); the
model applies this kernel per-shard-shape only when invoked outside a mesh context
or with shard-complete batches.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_row_tile(h: int, w: int, ic: int, oc: int, pool: bool) -> int:
    """Largest row tile <= 32 that divides H (even when pooling) AND whose working
    set fits scoped VMEM (16 MB/core): the dominant live buffers per tile are the
    f32 GEMM accumulator R*W*3*OC*4, the f32 output R*W*OC*4, the bf16 input halo
    stack and double-buffered in/out blocks — ~R*W*(20*OC + 10*IC) bytes total."""
    budget = 10 * 1024 * 1024
    step = 2 if pool else 1
    for r in range(32, step - 1, -step):
        if h % r or (pool and r % 2):
            continue
        if r * w * (20 * oc + 10 * ic) <= budget:
            return r
    return step  # pragma: no cover - minimal tile


def _kernel(x_ref, top_ref, bot_ref, w_ref, b_ref, o_ref, *, relu: bool, pool: bool):
    r, w_dim, ic = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    oc = b_ref.shape[-1]
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    x = x_ref[0]  # (R, W, IC)
    top = jnp.where(t == 0, jnp.zeros_like(top_ref[0]), top_ref[0])  # (1, W, IC)
    bot = jnp.where(t == nt - 1, jnp.zeros_like(bot_ref[0]), bot_ref[0])
    xx = jnp.concatenate([top, x, bot], axis=0)  # (R+2, W, IC)

    # 3 GEMMs (one per row shift); N carries the 3 column shifts: (R*W, 3*OC)
    acc = None
    for ky in range(3):
        lhs = xx[ky : ky + r].reshape(r * w_dim, ic)
        part = jax.lax.dot_general(
            lhs, w_ref[ky],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part

    # column shifts on the output: o[:, w] = sum_kx y_kx[:, w + kx - 1]
    y = acc.reshape(r, w_dim, 3 * oc)
    y0 = y[:, :, :oc]  # kx = 0 -> contributes to column w+1
    y1 = y[:, :, oc : 2 * oc]
    y2 = y[:, :, 2 * oc :]  # kx = 2 -> contributes to column w-1
    zcol = jnp.zeros((r, 1, oc), jnp.float32)
    o = y1
    o = o + jnp.concatenate([zcol, y0[:, : w_dim - 1]], axis=1)
    o = o + jnp.concatenate([y2[:, 1:], zcol], axis=1)

    o = o + b_ref[:].reshape(1, 1, oc)
    if relu:
        o = jnp.maximum(o, 0.0)

    if pool:
        # 2x2/s2 max entirely in VMEM. Mosaic shape casts must keep the minor (lane)
        # dim fixed, so pairs are split out as middle dims and reduced by static
        # indexing (a merged (W*OC) minor fails infer-vector-layout).
        q = o.reshape(r // 2, 2, w_dim, oc)
        a = jnp.maximum(q[:, 0], q[:, 1])  # (R/2, W, OC)
        c = a.reshape(r // 2, w_dim // 2, 2, oc)
        p = jnp.maximum(c[:, :, 0], c[:, :, 1])  # (R/2, W/2, OC)
        o_ref[0] = p.astype(o_ref.dtype)
    else:
        o_ref[0] = o.astype(o_ref.dtype)


def _conv3x3_pallas(
    x: jnp.ndarray,  # (B, H, W, IC)
    kernel: jnp.ndarray,  # (3, 3, IC, OC)
    bias: jnp.ndarray,  # (OC,)
    relu: bool,
    pool: bool,
    row_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:  # CPU (tests) has no Mosaic backend
        interpret = jax.default_backend() == "cpu"
    b, h, w, ic = x.shape
    oc = kernel.shape[-1]
    if pool and (h % 2 or w % 2):
        raise ValueError(f"2x2/s2 pool needs even H and W, got {h}x{w}")
    r = row_tile or _pick_row_tile(h, w, ic, oc, pool)
    assert h % r == 0, (h, r)
    if pool:
        assert r % 2 == 0, r
    nt = h // r

    # (3, 3, IC, OC) -> per-ky (IC, 3*OC), kx on the N axis
    wstack = kernel.astype(x.dtype).transpose(0, 2, 1, 3).reshape(3, ic, 3 * oc)
    bias_f32 = bias.astype(jnp.float32).reshape(1, oc)

    out_shape = (b, h // 2, w // 2, oc) if pool else (b, h, w, oc)
    grid = (b, nt)
    return pl.pallas_call(
        functools.partial(_kernel, relu=relu, pool=pool),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, w, ic), lambda bb, t: (bb, t, 0, 0),
                         memory_space=pltpu.VMEM),
            # halo rows: 1-row blocks with clamped absolute row index
            pl.BlockSpec((1, 1, w, ic), lambda bb, t: (bb, jnp.maximum(t * r - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, ic),
                         lambda bb, t, _h=h: (bb, jnp.minimum(t * r + r, _h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ic, 3 * oc), lambda bb, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc), lambda bb, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, r // 2, w // 2, oc) if pool else (1, r, w, oc),
            lambda bb, t: (bb, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * ic * oc,
            bytes_accessed=x.size * x.dtype.itemsize
            + int(np.prod(out_shape)) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, wstack, bias_f32)


def _conv3x3_xla(x, kernel, bias, relu, pool):
    """Reference XLA implementation (also the source of the backward pass)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(x.dtype)
    if pool:
        y = jax.lax.reduce_window(
            y, -jnp.inf if y.dtype == jnp.float32 else jnp.finfo(y.dtype).min,
            jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
        )
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_bias_relu(x, kernel, bias, relu: bool = True, pool: bool = False):
    """Fused 3x3 SAME conv + bias (+relu) (+2x2/s2 max-pool), Pallas forward.

    Matches `_conv3x3_xla` numerically (f32 accumulation on the MXU, one cast to the
    input dtype at the end); backward is XLA's vjp of that reference — exact
    gradients, hand-scheduled forward only.
    """
    return _conv3x3_pallas(x, kernel, bias, relu, pool)


def _fwd(x, kernel, bias, relu, pool):
    return conv3x3_bias_relu(x, kernel, bias, relu, pool), (x, kernel, bias)


def _bwd(relu, pool, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(lambda xx, kk, bb: _conv3x3_xla(xx, kk, bb, relu, pool), x, kernel, bias)
    return vjp(g)


conv3x3_bias_relu.defvjp(_fwd, _bwd)
