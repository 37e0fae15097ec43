"""2x2/stride-2 max pooling via reshapes — a MEASURED-AND-REJECTED experiment.

Hypothesis: XLA's max-pool gradient (`select-and-scatter`) costs 3.3 ms of the
53.8 ms batch-32 SSD300 train step (BASELINE.md round 2) against an ~1 ms HBM
floor; since 2x2/s2 windows are disjoint, both directions can be expressed as
reshapes + elementwise masks:

  forward:  reshape (B, H/2, 2, W/2, 2, C) -> max over the two window axes
  backward: route each output gradient to the FIRST maximal element of its
            window (select-and-scatter's tie-break) via an equality mask +
            cumsum==1 over the 4 window slots.

Measured outcome (v5e, batch 32): the train step got SLOWER, 53.8 -> 66.6 ms
device time. The even/odd (H/2, 2) interleave is a sublane-granularity relayout
that Mosaic/XLA materialize as real copies at 300^2 resolution, in both the
forward (the reshape-max) and the backward (the 6-D transposes), and those
copies cost more than the select-and-scatter they replace. The models therefore
keep `flax.linen.max_pool`/reduce_window (models/vgg.py, models/ssd.py); this op
stays in-tree as the documented negative result with value/gradient-parity tests
(tests/test_pooling.py) — the same status as ops/pallas_conv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_view(xp: jnp.ndarray):
    b, h, w, c = xp.shape
    return xp.reshape(b, h // 2, 2, w // 2, 2, c)


@jax.custom_vjp
def _pool_core(xp: jnp.ndarray) -> jnp.ndarray:
    return _window_view(xp).max(axis=(2, 4))


def _pool_fwd(xp):
    return _pool_core(xp), xp


def _pool_bwd(xp, g):
    q = _window_view(xp)  # (B, H/2, 2, W/2, 2, C)
    m = q.max(axis=(2, 4), keepdims=True)
    # (B, H/2, W/2, 4, C) with the window slots flattened in row-major order
    eq = (q == m).transpose(0, 1, 3, 2, 4, 5)
    b, h2, w2, _, _, c = eq.shape
    eqf = eq.reshape(b, h2, w2, 4, c)
    first = eqf & (jnp.cumsum(eqf.astype(jnp.int32), axis=3) == 1)
    gq = jnp.where(first, g[:, :, :, None, :], 0)
    dx = gq.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return (dx.reshape(xp.shape),)


_pool_core.defvjp(_pool_fwd, _pool_bwd)


def max_pool_2x2(x: jnp.ndarray, padding: str = "VALID") -> jnp.ndarray:
    """Drop-in for `nn.max_pool(x, (2, 2), (2, 2), padding)` on NHWC inputs.

    SAME pads odd extents at the bottom/right with the dtype's minimum (the padded
    slot never wins a max); VALID drops the remainder row/column — both exactly
    reduce_window's geometry for window 2 / stride 2.
    """
    b, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        if padding == "SAME":
            neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
                else jnp.iinfo(x.dtype).min
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=neg)
        elif padding == "VALID":
            x = x[:, : h - ph, : w - pw]
        else:
            raise ValueError(f"unknown padding {padding!r}")
    return _pool_core(x)
