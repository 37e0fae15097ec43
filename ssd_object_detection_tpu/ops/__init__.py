"""Pure-jnp geometry kernels: box math, anchor generation, matching, NMS.

These replace the reference's host-side numpy hot loops (reference utils/bbox.py:6-101,
models/ssd_model.py:173-194) with vectorized, jit-compatible XLA ops that run on TPU
inside the training/inference step with no host round-trips.
"""

from ssd_object_detection_tpu.ops import anchors, boxes, matching, nms, quant  # noqa: F401
