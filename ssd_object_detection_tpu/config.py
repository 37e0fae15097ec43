"""Typed configuration tree, YAML-loaded, schema-compatible with the reference.

The reference reads a raw yaml dict with zero validation (tools/train.py:16-19,22-69)
and separately hardcodes defaults in nested classes (models/ssd_model.py:20-48) — two
unsynchronized config surfaces. Here there is ONE dataclass tree whose field names
mirror config/default.yml exactly, so every reference YAML file loads unchanged;
TPU-native extensions (model.variant, model.precision, model.loss, parallel,
checkpoint) all have defaults that preserve reference behavior.
"""

# NOTE: no `from __future__ import annotations` here — _from_dict introspects
# dataclass field types at runtime and needs real classes, not string annotations.
import dataclasses
from typing import Any, Dict, Optional

import yaml


def _from_dict(cls, raw: Dict[str, Any]):
    """Build dataclass from a (possibly partial) dict, recursing into nested fields."""
    kwargs = {}
    for field in dataclasses.fields(cls):
        if field.name not in raw:
            continue
        value = raw[field.name]
        if dataclasses.is_dataclass(field.type) and isinstance(value, dict):
            value = _from_dict(field.type, value)
        kwargs[field.name] = value
    unknown = set(raw) - {f.name for f in dataclasses.fields(cls)}
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    return cls(**kwargs)


@dataclasses.dataclass
class MiniBatchConfig:  # data.mini_batch (config/default.yml:9-11)
    enable: bool = False
    num_data: int = 0


@dataclasses.dataclass
class AugmentConfig:  # TPU extension: the reference has no augmentation
    flip: bool = False
    expand: bool = False  # SSD-paper zoom-out
    crop: bool = False  # SSD-paper min-IoU sampled patch
    photometric: bool = False
    # True (default) runs expand/crop/photometric ON DEVICE inside the train step
    # (ops/augment.py: one affine resample; composes with the packed cache).
    # False keeps the host numpy recipe (data/augment.py), which needs the
    # JPEG-decode pipeline and is host-bound (~6x slower on a 1-vCPU host).
    device: bool = True


@dataclasses.dataclass
class DataConfig:  # config/default.yml:4-11
    dataset: str = "coco"  # "coco" | "synthetic"
    dataset_root: str = "./datasets/coco"
    shuffle: bool = True
    num_classes: int = 80
    mini_batch: MiniBatchConfig = dataclasses.field(default_factory=MiniBatchConfig)
    augment: AugmentConfig = dataclasses.field(default_factory=AugmentConfig)
    max_gt: int = 100  # TPU extension: static GT padding (SURVEY.md section 7)
    seed: int = 0  # TPU extension: shuffle/augmentation seed (reference shuffles unseeded)
    num_workers: int = 8  # TPU extension: host decode threads
    prefetch: int = 4
    # TPU extension: how many batches device_prefetch keeps in flight on the
    # device ahead of the consumer (parallel/mesh.py). 1 = classic double
    # buffering; 2 (default) also hides the host's batch-assembly gap on
    # high-latency host->device links (a tunneled TPU, a feed-bound pipeline).
    device_prefetch: int = 2
    # TPU extension: decode-once packed cache dir (data/packed.py). Empty = off.
    # Built on first use; epochs then read uint8 memmaps (no JPEG decode). Ignored
    # when pre-resize augmentation (expand/crop/photometric) is requested.
    packed_cache: str = ""


@dataclasses.dataclass
class OptimizerConfig:  # model.train.optimizer / model.warmup.optimizer
    name: str = "Adam"
    beta_1: float = 0.9
    beta_2: float = 0.999
    epsilon: float = 1e-7
    momentum: float = 0.0


@dataclasses.dataclass
class LrConfig:  # model.train.lr (config/default.yml:25-28)
    initial: float = 1e-3
    decay_step: int = 100
    decay_rate: float = 0.99


@dataclasses.dataclass
class TrainSection:  # model.train (config/default.yml:17-28)
    epoch: int = 20
    batch_size: int = 32
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    lr: LrConfig = dataclasses.field(default_factory=LrConfig)


@dataclasses.dataclass
class WarmupLrConfig:  # model.warmup.lr (config/default.yml:37-39)
    start: float = 1e-6
    end: float = 1e-3


@dataclasses.dataclass
class WarmupSection:  # model.warmup (config/default.yml:29-39)
    enable: bool = True
    step: int = 500
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    lr: WarmupLrConfig = dataclasses.field(default_factory=WarmupLrConfig)


@dataclasses.dataclass
class SplitTrainSection:  # model.split_train (config/default.yml:40-42)
    enable: bool = False
    batch_size: int = 4


@dataclasses.dataclass
class LossConfig:  # TPU extension: reference-exact vs canonical-SSD loss
    canonical: bool = False
    neg_pos_ratio: float = 3.0
    variance_xy: Optional[float] = None  # e.g. 0.1 (canonical); None = reference (no variances)
    variance_wh: Optional[float] = None  # e.g. 0.2

    @property
    def variances(self):
        if self.variance_xy is None or self.variance_wh is None:
            return None
        return (self.variance_xy, self.variance_wh)


@dataclasses.dataclass
class CheckpointConfig:  # TPU extension: orbax checkpointing + resume (ref has save-only .h5)
    enable: bool = True
    keep: int = 5
    resume: bool = False


@dataclasses.dataclass
class ModelConfig:  # config/default.yml:13-42
    log_dir: str = "./workshop/run"
    log_interval: int = 10
    # TB scalar cadence. The reference logs every step (models/ssd_model.py:281-285),
    # but each log is a device->host fetch. Measured on the v5e (53 ms step,
    # tunneled link): interval 1 = +58% step time, 10 = +5.3%, 20 = +2.0%
    # (BASELINE.md round 2). 20 keeps the tax ~2% while still charting smoothly.
    log_scalar_interval: int = 20
    save: str = "model_last"
    train: TrainSection = dataclasses.field(default_factory=TrainSection)
    warmup: WarmupSection = dataclasses.field(default_factory=WarmupSection)
    split_train: SplitTrainSection = dataclasses.field(default_factory=SplitTrainSection)
    # TPU extensions
    variant: str = "ssd300"  # any key of models/ssd.MODEL_SPECS (ssd300, ssd512, ssd300_r34, ssd512_r34, ssd300_mnv2)
    precision: str = "bfloat16"  # compute dtype: "float32" | "bfloat16"
    s2d_stem: bool = True  # space-to-depth block1 (exact rewrite, MXU-friendly conv1)
    eval_every: int = 0  # run val-split mAP every N epochs (0 = only via --eval-after)
    progress_bar: bool = True  # tqdm epoch bars with live loss postfix (reference UX)
    match_thresh: float = 0.5  # reference Config.thresh (models/ssd_model.py:48)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    checkpoint: CheckpointConfig = dataclasses.field(default_factory=CheckpointConfig)
    pretrained_vgg: Optional[str] = None  # path to Keras VGG16 .h5 weights (optional)
    remat: bool = False  # rematerialize the trunk in backward (larger batches)
    debug_nans: bool = False  # abort on first NaN/Inf in any jitted computation


@dataclasses.dataclass
class ProjectConfig:
    name: str = "ssd"


@dataclasses.dataclass
class ParallelConfig:  # TPU extension (BASELINE.json config #5)
    data_parallel: int = 0  # 0 = use all local devices


@dataclasses.dataclass
class Config:
    project: ProjectConfig = dataclasses.field(default_factory=ProjectConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    def validate(self) -> "Config":
        from ssd_object_detection_tpu.models.ssd import MODEL_SPECS

        assert self.model.variant in MODEL_SPECS, (
            f"unknown variant {self.model.variant!r}; registered: {sorted(MODEL_SPECS)}"
        )
        assert self.model.precision in ("float32", "bfloat16"), self.model.precision
        assert self.model.train.optimizer.name.lower() in ("adam", "sgd")
        assert self.model.warmup.optimizer.name.lower() in ("adam", "sgd")
        if self.model.split_train.enable:
            assert self.model.train.batch_size % self.model.split_train.batch_size == 0, (
                "batch_size must be divisible by split_train.batch_size"
            )
        assert self.data.dataset in ("coco", "synthetic"), self.data.dataset
        loss = self.model.loss
        assert (loss.variance_xy is None) == (loss.variance_wh is None), (
            "variance_xy and variance_wh must be set together"
        )
        if loss.canonical and loss.variances is None:
            # canonical mode without variances would be a hybrid that is neither
            # reference-exact nor SSD-paper (smooth-L1 + per-image mining but
            # reference offset encoding): default the paper's 0.1/0.2.
            loss.variance_xy, loss.variance_wh = 0.1, 0.2
        return self

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def load_config(path: str) -> Config:
    """YAML file -> validated Config (reference load_config, tools/train.py:16-19)."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    return _from_dict(Config, raw).validate()
