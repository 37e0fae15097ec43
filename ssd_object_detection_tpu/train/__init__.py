"""Training layer: optimizer schedules, train state, jitted step, and the loop."""

from ssd_object_detection_tpu.train.optim import (  # noqa: F401
    clip_by_norm_per_tensor,
    exponential_decay,
    make_optimizer,
    polynomial_decay,
)
from ssd_object_detection_tpu.train.step import TrainState, make_train_step  # noqa: F401
