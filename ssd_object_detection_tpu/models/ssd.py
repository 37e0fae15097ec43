"""SSD300 / SSD512 network: VGG-16 trunk -> extra conv pyramid -> loc/conf heads.

Re-architecture of the reference's Keras functional graph (models/ssd_model.py:74-171)
as one flax module compiled by XLA into a single fused program. The convolution stack,
feature-map taps, head layout, and output shapes match the reference exactly for SSD300:

  trunk (75x75x256) -> MaxPool s2 SAME (38x38)
  -> [512 3x3, 512 3x3, 512 1x1]                      tap fm0 38x38x512
  -> [1024 3x3 s2, 1024 1x1]                          tap fm1 19x19x1024
  -> [256 1x1, 512 3x3 s2]                            tap fm2 10x10x512
  -> [128 1x1, 256 3x3 s2]                            tap fm3  5x5x256
  -> [128 1x1, 256 3x3 VALID]                         tap fm4  3x3x256
  -> [128 1x1, 256 3x3 VALID]                         tap fm5  1x1x256
  heads: per-map 3x3 convs, n*4 loc + n*classes conf channels, n = (4,6,6,6,4,4)
  reshape+concat -> loc (B, 8732, 4), conf (B, 8732, classes), raw logits, bg LAST.

The (B,H,W,n*k) -> (B,H*W*n,k) row-major reshape reproduces the reference's anchor
ordering (models/ssd_model.py:166-167), matching ops/anchors.py.

TPU notes: compute dtype is configurable (bfloat16 recommended — conv FLOPs land on the
MXU at double rate); params stay float32; head outputs are cast back to float32 so loss
and decode run at full precision.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ssd_object_detection_tpu.models.vgg import VGG16Trunk
from ssd_object_detection_tpu.ops.anchors import SSD300_SPEC, SSD512_SPEC, AnchorSpec

# One extra-pyramid conv: (features, kernel, stride, padding[, dilation]).
# Dilation leaves the kernel SHAPE unchanged (checkpoints interchange with the
# undilated stack) but multiplies the layer's receptive-field contribution —
# the SSD paper's own dilated-fc6 trick (arXiv:1512.02325 §3).
ConvSpec = Tuple[int, int, int, str]


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static architecture description; `blocks[i]` ends at feature-map tap i.

    `trunk` selects the backbone family: "vgg16" (reference parity; trunk output is
    pooled 2x before the pyramid) or "resnet34" (models/resnet.py; trunk emits the
    38x38 tap-0 resolution directly — blocks[0] is empty, tapping the trunk output).
    """

    name: str
    anchor_spec: AnchorSpec
    blocks: Tuple[Tuple[ConvSpec, ...], ...]
    trunk: str = "vgg16"

    @property
    def image_size(self) -> int:
        return self.anchor_spec.image_size


SSD300_SPEC_MODEL = ModelSpec(
    name="ssd300",
    anchor_spec=SSD300_SPEC,
    blocks=(
        ((512, 3, 1, "SAME"), (512, 3, 1, "SAME"), (512, 1, 1, "SAME")),
        ((1024, 3, 2, "SAME"), (1024, 1, 1, "SAME")),
        ((256, 1, 1, "SAME"), (512, 3, 2, "SAME")),
        ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
        ((128, 1, 1, "SAME"), (256, 3, 1, "VALID")),
        ((128, 1, 1, "SAME"), (256, 3, 1, "VALID")),
    ),
)

# SSD512 variant (BASELINE.json config #4): 7 taps; deeper pyramid reaches 1x1 via
# strided SAME convs (512 -> 128 trunk -> 64 -> 32 -> 16 -> 8 -> 4 -> 2 -> 1).
#
# Dilations (the round-5 VGG-512 root-cause fix): the reference truncates VGG at
# block3_conv3, which leaves the pyramid taps with receptive fields of
# (76, 92, 124, 188) px — enough at 300x300, where the anchor scale set assigns
# objects of up to (45, 90, 135, 180) px to those taps, but NOT at 512x512, where
# the same relative scales are (77, 154, 230, 307) px: taps 1-3 could not see the
# objects they had to localize, and the family plateaued at mAP@0.5 0.844 while
# ssd512_r34 (a trunk with a far larger RF) scored 1.0 on the same data/recipe
# (EVAL_SYNTHETIC_SSD512_R34.json; per-level evidence in DIAG_SSD512_LEVELS.json).
# Dilating extra0 (x2, x3), extra1's 3x3 (x6 — the SSD paper's dilated-fc6,
# arXiv:1512.02325) and extra2's 3x3 (x2) lifts tap RFs to (124, 220, 284, 348) px
# — covering every tap's object band — with identical parameter shapes and FLOPs.
SSD512_SPEC_MODEL = ModelSpec(
    name="ssd512",
    anchor_spec=SSD512_SPEC,
    blocks=(
        ((512, 3, 1, "SAME", 2), (512, 3, 1, "SAME", 3), (512, 1, 1, "SAME")),
        ((1024, 3, 2, "SAME", 6), (1024, 1, 1, "SAME")),
        ((256, 1, 1, "SAME"), (512, 3, 2, "SAME", 2)),
        ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
        ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
        ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
        ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
    ),
)

# ResNet-34 backbone family (MLPerf SSD-R34 pyramid shape; models/resnet.py). The
# trunk emits 38x38x256 directly, so tap 0 is the trunk output and the remaining
# pyramid matches SSD300's strided blocks. Same anchor spec as SSD300 — checkpoints,
# decode, and eval machinery are shared; only the backbone differs (~1/3 the FLOPs).
SSD300_R34_SPEC_MODEL = ModelSpec(
    name="ssd300_r34",
    anchor_spec=SSD300_SPEC,
    trunk="resnet34",
    blocks=(
        (),  # tap 0 = trunk output (38x38x256)
        ((256, 1, 1, "SAME"), (512, 3, 2, "SAME")),
        ((256, 1, 1, "SAME"), (512, 3, 2, "SAME")),
        ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
        ((128, 1, 1, "SAME"), (256, 3, 1, "VALID")),
        ((128, 1, 1, "SAME"), (256, 3, 1, "VALID")),
    ),
)

# Undilated 512 pyramid tail for the non-VGG trunks: R34/MNV2 passed their 512
# convergence gates with plain convs (their trunks already have ample receptive
# field), so their stacks stay exactly as gated.
_SSD512_PLAIN_TAIL = (
    ((1024, 3, 2, "SAME"), (1024, 1, 1, "SAME")),
    ((256, 1, 1, "SAME"), (512, 3, 2, "SAME")),
    ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
    ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
    ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
    ((128, 1, 1, "SAME"), (256, 3, 2, "SAME")),
)

# SSD512 on the ResNet-34 trunk: at 512^2 the trunk emits 64x64x256 = SSD512's tap-0
# resolution, so the strided pyramid is SSD512's tail unchanged.
SSD512_R34_SPEC_MODEL = ModelSpec(
    name="ssd512_r34",
    anchor_spec=SSD512_SPEC,
    trunk="resnet34",
    blocks=((),) + _SSD512_PLAIN_TAIL,
)

# MobileNetV2 backbone family (models/mobilenet.py; SSDLite's trunk with the same
# stride-1 tap adaptation as R34): 38x38x96 trunk output, shared strided pyramid.
# Topology breadth for edge/CPU export targets — depthwise convs are VPU-bound on
# TPU (measured in BASELINE.md); the TPU throughput family remains R34.
SSD300_MNV2_SPEC_MODEL = ModelSpec(
    name="ssd300_mnv2",
    anchor_spec=SSD300_SPEC,
    trunk="mobilenetv2",
    blocks=SSD300_R34_SPEC_MODEL.blocks,
)

# SSD512 on the MobileNetV2 trunk: at 512^2 the trunk emits 64x64x96 = SSD512's
# tap-0 resolution, so the strided pyramid is SSD512's blocks[1:] unchanged.
SSD512_MNV2_SPEC_MODEL = ModelSpec(
    name="ssd512_mnv2",
    anchor_spec=SSD512_SPEC,
    trunk="mobilenetv2",
    blocks=((),) + _SSD512_PLAIN_TAIL,
)

MODEL_SPECS = {
    "ssd300": SSD300_SPEC_MODEL,
    "ssd512": SSD512_SPEC_MODEL,
    "ssd300_r34": SSD300_R34_SPEC_MODEL,
    "ssd512_r34": SSD512_R34_SPEC_MODEL,
    "ssd300_mnv2": SSD300_MNV2_SPEC_MODEL,
    "ssd512_mnv2": SSD512_MNV2_SPEC_MODEL,
}


class SSD(nn.Module):
    """Full SSD detector. Input: (B, S, S, 3) in [-1, 1]. Output: (loc, conf_logits).

    `remat=True` rematerializes the VGG trunk in the backward pass (jax.checkpoint):
    trades ~1 extra trunk forward for dropping the trunk's 300^2-resolution
    activations (the largest buffers) from HBM — the standard TPU recipe for raising
    the trainable batch size.
    """

    num_classes: int = 81  # INCLUDING background, which is the LAST channel
    spec: ModelSpec = SSD300_SPEC_MODEL
    dtype: Any = jnp.float32
    remat: bool = False
    s2d_stem: bool = False  # MXU-friendly conv1 (numerically identical; models/vgg.py)
    # False keeps conf logits in the COMPUTE dtype (e.g. bf16) instead of casting the
    # (B, D, C) tensor up to f32 at the output. The f32 cast adds no information (the
    # head convs already computed in `dtype`), but it doubles the HBM traffic of every
    # downstream pass over the logits — the inference ranking stage reads this tensor
    # 2-3x (eval/predict.detect_from_logits), which casts to f32 INSIDE its fused
    # reductions, so detection results are bit-identical either way. Default True
    # preserves the reference-parity API (f32 outputs) for training/eval/import paths.
    conf_f32: bool = True

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        x = images.astype(self.dtype)
        if self.spec.trunk == "resnet34":
            from ssd_object_detection_tpu.models.resnet import ResNet34Trunk

            # s2d_stem is a VGG-conv1 rewrite; ignored here (conv1 is 7x7/2 on the
            # MXU already) so config defaults work across variants
            trunk = nn.remat(ResNet34Trunk) if self.remat else ResNet34Trunk
            x = trunk(dtype=self.dtype, name="resnet")(x)  # 38x38x256: tap-0 resolution
        elif self.spec.trunk == "mobilenetv2":
            from ssd_object_detection_tpu.models.mobilenet import MobileNetV2Trunk

            trunk = nn.remat(MobileNetV2Trunk) if self.remat else MobileNetV2Trunk
            x = trunk(dtype=self.dtype, name="mobilenet")(x)  # 38x38x96 tap
        elif self.spec.trunk == "micro":
            # Dryrun/CI-scale stem: two strided convs -> image/4 resolution. Not a
            # product variant — exists so the driver's multi-chip dry run and tests
            # compile in seconds on a 1-vCPU host while exercising the identical
            # pyramid/head/matching/loss/sharding paths (round-2 lesson: a VGG trunk
            # in the dryrun model multiplied XLA compile time past the gate timeout).
            for i, ch in enumerate((32, 64)):
                x = nn.Conv(
                    ch, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name=f"micro_conv{i}",
                )(x)
                x = nn.relu(x)
        else:
            trunk = nn.remat(VGG16Trunk) if self.remat else VGG16Trunk
            x = trunk(dtype=self.dtype, s2d_stem=self.s2d_stem, name="vgg")(x)
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")

        feature_maps = []
        for bi, block in enumerate(self.spec.blocks):
            for ci, spec in enumerate(block):
                features, kernel, stride, padding = spec[:4]
                dilation = spec[4] if len(spec) > 4 else 1
                x = nn.Conv(
                    features,
                    kernel_size=(kernel, kernel),
                    strides=(stride, stride),
                    padding=padding,
                    kernel_dilation=(dilation, dilation),
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"extra{bi}_conv{ci}",
                )(x)
                x = nn.relu(x)
            feature_maps.append(x)

        anchor_spec = self.spec.anchor_spec
        assert len(feature_maps) == len(anchor_spec.feature_sizes)
        locs, confs = [], []
        for i, (fm, n_priors, (fh, fw)) in enumerate(
            zip(feature_maps, anchor_spec.anchors_per_cell, anchor_spec.feature_sizes)
        ):
            assert fm.shape[1:3] == (fh, fw), (
                f"feature map {i} is {fm.shape[1:3]}, anchor spec expects {(fh, fw)}"
            )
            loc = nn.Conv(
                n_priors * 4, kernel_size=(3, 3), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32, name=f"loc_head{i}",
            )(fm)
            conf = nn.Conv(
                n_priors * self.num_classes, kernel_size=(3, 3), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32, name=f"conf_head{i}",
            )(fm)
            locs.append(loc.reshape(loc.shape[0], -1, 4))
            confs.append(conf.reshape(conf.shape[0], -1, self.num_classes))

        loc_out = jnp.concatenate(locs, axis=1).astype(jnp.float32)
        conf_out = jnp.concatenate(confs, axis=1)
        if self.conf_f32:
            conf_out = conf_out.astype(jnp.float32)
        return loc_out, conf_out
