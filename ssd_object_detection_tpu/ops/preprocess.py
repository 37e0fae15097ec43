"""Fused on-device preprocessing: uint8 canvas -> per-image resize -> normalize.

Replaces the reference's host-side cv2 pipeline (reference
data_loaders/ssd/make_dataset.py:37-46 resize; data_loaders/coco/make_dataset.py:115-134
decode/normalize) with device-side ops inside the same jit as the forward pass
(BASELINE.json config #2: decode -> resize -> normalize -> forward -> NMS). The host
keeps only JPEG decode; each decoded image is pasted into a fixed uint8 canvas
(static shapes for XLA) and the TPU does the rest.

TPU-first design notes:
  - The canvas is PLANAR (B, 3, Hc, Wc): both resize gathers then run with a wide
    spatial minor axis (Wc, then S) on the 128-lane tiles. An interleaved
    (B, H, W, 3) layout would put 3 on the lanes (~2% utilization) for every gather.
  - Per-image sizes are runtime values: the bilinear sample grid (indices + lerp
    weights) is computed per image on device; shapes stay static.
  - Sampling convention matches cv2.resize INTER_LINEAR: src = (dst+0.5)*scale-0.5,
    clamped to the valid region (replicate border), which is also what the host
    pipeline (data/pipeline.py) uses — not bit-identical to cv2's fixed-point
    arithmetic, but the same geometry.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _axis_grid(valid: jnp.ndarray, out_size: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bilinear sample grid along one axis.

    Args:
      valid: (B,) int32 — valid extent of each image along this axis.
      out_size: static output extent S.
    Returns (i0, i1, frac): (B, S) int32, int32, float32 with i0 <= i1 < valid.
    """
    pos = jnp.arange(out_size, dtype=jnp.float32) + 0.5  # (S,)
    scale = valid.astype(jnp.float32) / out_size  # (B,)
    src = pos[None, :] * scale[:, None] - 0.5  # (B, S)
    src = jnp.clip(src, 0.0, valid.astype(jnp.float32)[:, None] - 1.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, valid[:, None] - 1)
    return i0, i1, src - i0.astype(jnp.float32)


def _axis_matrix(valid: jnp.ndarray, out_size: int, in_size: int) -> jnp.ndarray:
    """Dense per-image interpolation matrix (B, S, in_size) f32: row s holds weight
    (1-frac) at column i0[s] and frac at i1[s] (a single 1.0 where i0 == i1)."""
    i0, i1, frac = _axis_grid(valid, out_size)
    cols = jnp.arange(in_size, dtype=jnp.int32)
    m0 = jnp.where(i0[..., None] == cols, 1.0 - frac[..., None], 0.0)
    m1 = jnp.where(i1[..., None] == cols, frac[..., None], 0.0)
    return m0 + m1  # (B, S, in_size)


def resize_bilinear_planar(
    canvas_u8: jnp.ndarray,  # (B, 3, Hc, Wc) uint8, image in the top-left (h, w) region
    sizes: jnp.ndarray,  # (B, 2) int32: (h, w) valid extents
    out_size: int,
    method: str = "matmul",
) -> jnp.ndarray:
    """Per-image bilinear resize of the valid canvas region -> (B, S, S, 3) float32 [0,1].

    method="matmul" (default, the TPU path): separable bilinear resize as two batched
    MXU matmuls against per-image interpolation matrices, out = R @ img @ C^T.
    Identical sample grid to the gather path; measured ~3x faster at batch 32 on v5e
    (the gather lowering is HBM-inefficient: ~1.3 ms for a ~56 MB logical traffic
    stage). uint8 pixels are exact in bf16 (integers <= 256) and both matmuls
    accumulate in f32; only the bf16 rounding of the interpolation weights (and of
    the one intermediate) differs from exact float arithmetic, bounded by ~1.5/255
    per pixel. Identity-size sampling stays bit-exact (weights are pure 0/1).

    method="gather": two take_along_axis lerps, full f32 arithmetic.
    """
    if method == "matmul":
        hc, wc = canvas_u8.shape[2], canvas_u8.shape[3]
        r = _axis_matrix(sizes[:, 0], out_size, hc).astype(jnp.bfloat16)  # (B, S, Hc)
        c = _axis_matrix(sizes[:, 1], out_size, wc).astype(jnp.bfloat16)  # (B, S, Wc)
        cf = canvas_u8.astype(jnp.bfloat16)
        rows = jnp.einsum(
            "bsh,bchw->bcsw", r, cf, preferred_element_type=jnp.float32
        )  # (B, 3, S, Wc)
        out = jnp.einsum(
            "bcsw,btw->bcst", rows.astype(jnp.bfloat16), c,
            preferred_element_type=jnp.float32,
        )  # (B, 3, S, S)
    elif method == "gather":
        y0, y1, wy = _axis_grid(sizes[:, 0], out_size)
        x0, x1, wx = _axis_grid(sizes[:, 1], out_size)
        # rows: gather along Hc (axis 2) -> (B, 3, S, Wc); lerp in f32 (bf16's 8
        # mantissa bits would round uint8 lerps by ~0.5/255)
        r0 = jnp.take_along_axis(canvas_u8, y0[:, None, :, None], axis=2).astype(jnp.float32)
        r1 = jnp.take_along_axis(canvas_u8, y1[:, None, :, None], axis=2).astype(jnp.float32)
        rows = r0 + (r1 - r0) * wy[:, None, :, None]

        # cols: gather along Wc (axis 3) -> (B, 3, S, S)
        c0 = jnp.take_along_axis(rows, x0[:, None, None, :], axis=3)
        c1 = jnp.take_along_axis(rows, x1[:, None, None, :], axis=3)
        out = c0 + (c1 - c0) * wx[:, None, None, :]
    else:
        raise ValueError(f"unknown resize method {method!r}")

    return out.transpose(0, 2, 3, 1) / 255.0  # (B, S, S, 3) in [0, 1]


def normalize01(images01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1], the reference's (x - 0.5) * 2 (models/ssd_model.py:214)."""
    return (images01 - 0.5) * 2.0


def pack_canvas(images, canvas_hw: Tuple[int, int] = (640, 640)):
    """HOST helper: list of HWC uint8 arrays -> (planar canvas (B,3,Hc,Wc), sizes (B,2)).

    Raises if an image exceeds the canvas; COCO's max side is 640, so the default
    canvas fits every COCO image. Larger sources must be pre-shrunk by the caller.
    """
    import numpy as np

    hc, wc = canvas_hw
    b = len(images)
    canvas = np.zeros((b, 3, hc, wc), np.uint8)
    sizes = np.zeros((b, 2), np.int32)
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        if h > hc or w > wc:
            raise ValueError(f"image {i} ({h}x{w}) exceeds canvas {hc}x{wc}")
        canvas[i, :, :h, :w] = img.transpose(2, 0, 1)
        sizes[i] = (h, w)
    return canvas, sizes
