"""VGG-16 feature trunk, truncated at block3_conv3.

The reference builds this from keras.applications.VGG16 with ImageNet weights and taps
the `block3_conv3` activation (reference models/ssd_model.py:77-82). Here it is an
explicit flax module (NHWC) with Keras-compatible layer names so ImageNet weights can be
imported from a Keras .h5 file when one is available (models/import_keras.py); with zero
network egress the default is truncated-normal init.

For a 300x300 input the trunk output is 75x75x256 (two 2x2 max-pools); for 512 -> 128.

TPU performance — the space-to-depth stem (`s2d_stem=True`):
block1_conv1 has 3 input channels; the MXU contracts over 128-lane tiles, so a direct
3->64 conv at 300x300 wastes >95% of the systolic array and was measured at 4.8 ms of
a 17.1 ms batch-32 forward (BASELINE.md). Fix: space-to-depth the input 2x2
(300,300,3)->(150,150,12) and run an EXACTLY equivalent 3x3 conv whose kernel is a
deterministic zero-padded scatter of the original (3,3,3,64) kernel into
(3,3,12,256) — the 2x2 output phases become channels, giving a 108-wide contraction
that tiles onto the MXU. Parameters are unchanged (same names/shapes, checkpoints
interchange); equivalence is algebraic, not approximate (see `_fold_s2d_kernel`), and
is asserted by tests/test_model.py::test_s2d_stem_matches_plain_stem.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _s2d_fold_index(kernel_hw: int = 3, factor: int = 2):
    """Static gather indices + mask folding a (k,k,IC,OC) conv kernel into the
    space-to-depth domain: (k,k, factor^2*IC, factor^2*OC).

    Derivation: the original conv output at (f*i+d, ...) for phase d in [0,factor)
    reads input row f*i + d + ky - p (p = (k-1)//2). The s2d conv at row i with tap ty
    and input sub-row sy reads original row f*(i+ty-p) + sy. Equating:
    ky = f*(ty-p) + sy - d + p, valid iff 0 <= ky < k. The map (ty,sy) -> ky is
    injective per d, so each original tap is placed exactly once and the folded conv
    is algebraically identical to the original (including SAME zero-padding, because
    s2d SAME padding of the factor-reduced grid covers exactly the original halo rows
    and all out-of-range taps are masked to zero).
    """
    k, f = kernel_hw, factor
    p = (k - 1) // 2
    ty, sy, dy = np.meshgrid(np.arange(k), np.arange(f), np.arange(f), indexing="ij")
    ky = f * (ty - p) + sy - dy + p  # (k, f, f) indexed [tap, sub, phase]
    valid = (ky >= 0) & (ky < k)
    return np.clip(ky, 0, k - 1), valid


def _fold_s2d_kernel(kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Fold a (k,k,IC,OC) HWIO kernel into its space-to-depth equivalent
    (k,k, factor^2*IC, factor^2*OC); in-channel order (sy,sx,ic), out (dy,dx,oc)."""
    k, _, ic, oc = kernel.shape
    ky, vy = _s2d_fold_index(k, factor)  # (k, f, f)
    kx, vx = _s2d_fold_index(k, factor)
    # folded[ty,tx,sy,sx,ic,dy,dx,oc] = W[ky[ty,sy,dy], kx[tx,sx,dx], ic, oc] * valid
    gathered = kernel[
        ky[:, None, :, None, :, None],  # (ty,tx,sy,sx,dy,dx) broadcast
        kx[None, :, None, :, None, :],
    ]  # -> (k,k,f,f,f,f,ic,oc)
    mask = (vy[:, None, :, None, :, None] & vx[None, :, None, :, None, :]).astype(
        kernel.dtype
    )
    folded = gathered * mask[..., None, None]
    # (ty,tx,sy,sx,dy,dx,ic,oc) -> (ty,tx,sy,sx,ic,dy,dx,oc)
    folded = folded.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    f = factor
    return folded.reshape(k, k, f * f * ic, f * f * oc)


def space_to_depth(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C), channel order (sy, sx, c)."""
    b, h, w, c = x.shape
    f = factor
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Inverse of `space_to_depth`: channel order (dy, dx, c) -> spatial."""
    b, h, w, cc = x.shape
    f = factor
    c = cc // (f * f)
    x = x.reshape(b, h, w, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, c)


class _S2DConv(nn.Module):
    """A 3x3 SAME conv (+relu) computed in the 2x2 space-to-depth domain: input
    (B,H,W,4*IC) with phase-major channels, output (B,H,W,4*OC). Registers the SAME
    params as the plain `nn.Conv` (kernel (3,3,IC,OC), bias (OC,)) so checkpoints
    trained with either stem load into the other."""

    features: int = 64
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_s2d: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_channels, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        folded = _fold_s2d_kernel(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x_s2d.astype(self.dtype),
            folded,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # out channel = (dy, dx, c): bias repeats per 2x2 phase
        y = y + jnp.tile(bias, 4).astype(self.dtype)
        return nn.relu(y)


class VGG16Trunk(nn.Module):
    """conv3-64 x2, pool, conv3-128 x2, pool, conv3-256 x3 (through block3_conv3).

    `s2d_stem=True` runs ALL of block1 in the 2x2 space-to-depth domain (numerically
    identical, see module docstring): s2d -> folded conv1 -> folded conv2 -> pool1,
    where pool1 (spatial 2x2/s2) becomes a channelwise max over the 4 phase groups —
    each s2d pixel's phases ARE its pooling window — so no depth-to-space is ever
    materialized and pool1's 300x300-resolution memory traffic disappears.
    Requires even H, W.
    """

    dtype: Any = jnp.float32
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stages = ((1, 64, 2), (2, 128, 2), (3, 256, 3))
        for block, features, n_convs in stages:
            if block == 1 and self.s2d_stem:
                x = space_to_depth(x.astype(self.dtype))
                x = _S2DConv(64, 3, dtype=self.dtype, name="block1_conv1")(x)
                x = _S2DConv(64, 64, dtype=self.dtype, name="block1_conv2")(x)
                # pool1: max over the (dy, dx) phase axes == spatial 2x2 stride-2 max
                b, h, w, _ = x.shape
                x = x.reshape(b, h, w, 4, 64).max(axis=3)
                continue
            if block > 1 and not (block == 2 and self.s2d_stem):
                # reduce_window, NOT ops/pooling.max_pool_2x2: the mask-based
                # backward was measured SLOWER end-to-end (54 -> 67 ms/step; its
                # even/odd interleave relayouts cost more than select-and-scatter
                # itself — BASELINE.md round 2)
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            for i in range(1, n_convs + 1):
                x = nn.Conv(
                    features,
                    kernel_size=(3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"block{block}_conv{i}",
                )(x)
                x = nn.relu(x)
        return x
