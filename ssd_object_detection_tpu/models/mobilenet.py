"""MobileNetV2 detection trunk (GroupNorm variant) — third backbone family.

The reference ships only the VGG-16 trunk (reference models/ssd_model.py:77-82);
this adds the canonical mobile/edge detector backbone (Sandler et al. 2018,
"MobileNetV2: Inverted Residuals and Linear Bottlenecks" — the SSDLite trunk) in
the same adapted shape as the R34 family: the last strided stage runs at stride 1
so a 300x300 input yields a 38x38x96 feature that feeds the shared SSD pyramid
directly (the MLPerf-R34 "stride-1 tap" trick, models/resnet.py):

    stem conv 3x3/2 32                        150x150
    stage (t=1, c=16,  n=1, s=1)              150x150
    stage (t=6, c=24,  n=2, s=2)              75x75
    stage (t=6, c=32,  n=3, s=2)              38x38
    stage (t=6, c=64,  n=4, s=1)  [canon s=2] 38x38
    stage (t=6, c=96,  n=3, s=1)              38x38   <- tap
    (the 160/320 stages are dropped; the SSD pyramid's strided convs take over)

Inverted residual: 1x1 expand (xt) -> 3x3 DEPTHWISE (stride s) -> 1x1 linear
project, residual add when shapes allow. GroupNorm(8) replaces BatchNorm for the
same purity reasons as the R34 family (stateless, micro-batch/DP-invariant;
models/resnet.py docstring); relu6 activations as in the paper.

TPU-first honesty: depthwise convolutions contract over ONE channel, so they
cannot use the MXU's 128-wide systolic contraction — they run on the VPU and are
HBM-bound. The conventional wisdom is therefore "MobileNets don't win on TPU" —
and the measurement (BASELINE.md round 2, which owns the exact numbers) says
otherwise AT THIS SCALE: the trunk has so few FLOPs (~0.9 GFLOP/img vs R34's ~19
and VGG's ~49) that even at poor per-op utilization it is the fastest family
end-to-end on v5e (fused batch-32 inference ~3.5k img/s vs R34 ~2.8k and VGG
~1.7k; train step ~equal to R34 — GroupNorm/backward costs dominate there). Pick
by accuracy budget: VGG = reference parity, R34 = accuracy-per-watt of MXU FLOPs,
MNV2 = latency/throughput.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    """MobileNetV2 bottleneck: 1x1 expand -> 3x3 depthwise -> 1x1 linear project."""

    features: int  # output channels c
    expand: int  # expansion factor t
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        norm = lambda name: nn.GroupNorm(  # noqa: E731
            num_groups=8, dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, kernel_size=(1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="expand")(y)
            y = _relu6(norm("expand_norm")(y))
        # depthwise 3x3: one group per channel (feature_group_count = channels)
        y = nn.Conv(
            mid, kernel_size=(3, 3), strides=(self.stride, self.stride),
            padding="SAME", feature_group_count=mid, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="depthwise",
        )(y)
        y = _relu6(norm("dw_norm")(y))
        y = nn.Conv(self.features, kernel_size=(1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="project")(y)
        y = norm("project_norm")(y)  # linear bottleneck: no activation
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV2Trunk(nn.Module):
    """MobileNetV2 through the 96-channel stage (stride-1 tap): 300^2 -> 38^2x96."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(32, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(x)
        x = _relu6(nn.GroupNorm(num_groups=8, dtype=self.dtype,
                                param_dtype=jnp.float32, name="stem_norm")(x))
        # (expand t, channels c, repeats n, first stride s); the canonical s=2 of
        # the 64-stage is removed to keep the 38x38 tap resolution
        for si, (t, c, n, s) in enumerate(
            ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 1), (6, 96, 3, 1))
        ):
            for bi in range(n):
                x = InvertedResidual(
                    c, expand=t, stride=s if bi == 0 else 1,
                    dtype=self.dtype, name=f"stage{si}_block{bi}",
                )(x)
        return x
