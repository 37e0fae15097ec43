"""TPU-native SSD object-detection framework.

A from-scratch JAX/XLA/pjit re-architecture of the capabilities of
AcherStyx/SSD-Object-Detection (reference mounted at /root/reference): an SSD300/SSD512
trainer + inference stack for COCO where anchor generation, IoU matching, offset
encoding, MultiBox loss with hard-negative mining, box decoding, and (new) batched
per-class NMS all run as pure jitted functions on TPU, scaling to multi-chip data
parallelism over ICI via `jax.sharding`.

Layer map (mirrors SURVEY.md section 1, re-architected):
  tools/train.py         CLI / config layer (argparse + YAML, same schema)
  train/                 training loop, optimizer schedules, checkpointing
  models/                flax SSD300/SSD512 network definitions
  ops/                   pure-jnp geometry kernels: boxes, anchors, matching, NMS
  data/                  COCO pipeline (own JSON index; no pycocotools dependency)
  eval/                  batched prediction + COCO-style mAP
  parallel/              device mesh + sharding helpers
  utils/                 visualization + logging parity helpers
"""

__version__ = "0.1.0"

from ssd_object_detection_tpu.ops import anchors, boxes, matching  # noqa: F401
