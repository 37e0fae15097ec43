"""ResNet-34 detection trunk (MLPerf SSD-R34 topology, GroupNorm variant).

A second backbone family for the framework (the reference ships only the VGG-16
trunk, models/ssd_model.py:77-82). The topology follows the MLPerf single-stage
detector backbone: standard ResNet-34 through layer3 with layer3's downsample
removed, so a 300x300 input yields a 38x38x256 feature that feeds the SSD pyramid
directly (no extra pool):

    conv1 7x7/2 64 -> norm/relu -> maxpool 3x3/2
    layer1: 3 basic blocks,  64 ch, stride 1   (75x75)
    layer2: 4 basic blocks, 128 ch, stride 2   (38x38)
    layer3: 6 basic blocks, 256 ch, stride 1   (38x38)  <- tap

TPU-first design choices:
  - All compute is 3x3/7x7 convolutions with >=64-channel contractions — every FLOP
    lands on the MXU (unlike depthwise-separable backbones, whose depthwise stage is
    VPU-bound on TPU). At ~1/3 the FLOPs of the VGG trunk this is the family that
    maximizes accuracy per MXU-FLOP; the MobileNetV2 family (models/mobilenet.py)
    measured faster still end-to-end simply by having ~20x fewer FLOPs.
  - **GroupNorm instead of BatchNorm.** BatchNorm carries running statistics
    (mutable state) and computes over whatever slice of the batch the executing
    program sees — under gradient accumulation (`split_train`'s lax.scan over
    micro-batches, train/step.py) and under data-parallel sharding its semantics
    depend on the execution layout. GroupNorm is stateless and per-sample, so the
    train step stays a pure function of (params, batch), checkpoints stay
    params-only, and micro-batching/DP cannot change the math. GN matches BN
    accuracy for detection backbones (Wu & He, "Group Normalization", 2018).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    """ResNet basic block: 3x3 conv -> GN -> relu -> 3x3 conv -> GN -> add -> relu.

    The projection shortcut (1x1 conv + GN) is used when stride != 1 or the channel
    count changes, as in canonical ResNet."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, kernel_size=(k, k), strides=(s, s), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        norm = lambda name: nn.GroupNorm(  # noqa: E731
            num_groups=min(32, self.features), dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        residual = x
        y = conv(self.features, 3, self.stride, "conv1")(x)
        y = nn.relu(norm("norm1")(y))
        y = conv(self.features, 3, 1, "conv2")(y)
        y = norm("norm2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = conv(self.features, 1, self.stride, "proj")(x)
            residual = norm("proj_norm")(residual)
        return nn.relu(y + residual)


class ResNet34Trunk(nn.Module):
    """ResNet-34 through layer3 (stride-1 layer3, MLPerf SSD shape): 300^2 -> 38^2x256."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            64, kernel_size=(7, 7), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="norm1")(x))
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding="SAME")
        # (n_blocks, features, first_stride); layer3 keeps stride 1 (MLPerf SSD-R34)
        for li, (n_blocks, features, stride) in enumerate(
            ((3, 64, 1), (4, 128, 2), (6, 256, 1)), start=1
        ):
            for bi in range(n_blocks):
                x = BasicBlock(
                    features, stride=stride if bi == 0 else 1,
                    dtype=self.dtype, name=f"layer{li}_block{bi}",
                )(x)
        return x
