"""2-D mesh (data x model) sharding: optional tensor parallelism for wide layers.

SSD at 38M params doesn't NEED tensor parallelism (SURVEY.md section 2: DP is the
production decomposition; params replicate comfortably). This module exists for (a)
activation-memory relief at very large batch sizes and (b) validating that the train
step's sharding story generalizes beyond pure DP: the widest conv kernels (the
1024-channel fc6/fc7 analogs and the 512-channel pyramid convs) shard on their OUTPUT
channel axis over the 'model' mesh axis, GSPMD propagates the sharding through bias
adds and inserts the all-gathers where following layers need full channels.

Used by __graft_entry__.dryrun_multichip to compile-and-run a (data, model) mesh.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def make_2d_mesh(dp: int, tp: int, devices: Optional[Any] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * tp, (len(devices), dp, tp)
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp), ("data", "model"))


def shard_params_tp(params: Any, mesh: Mesh, min_channels: int = 256) -> Any:
    """Place params: conv kernels/biases with >= min_channels output channels
    divisible by the 'model' axis size shard on that axis; everything else replicates.
    """
    tp = mesh.shape["model"]

    def place(path, leaf):
        out_ch = leaf.shape[-1]
        if leaf.ndim >= 1 and out_ch >= min_channels and out_ch % tp == 0:
            spec = P(*([None] * (leaf.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    flat = jax.tree_util.tree_flatten_with_path(params)
    placed = [place(p, l) for p, l in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], placed)


def shard_state_tp(state, mesh: Mesh, min_channels: int = 256):
    """Shard a TrainState: params + optimizer moments get matching TP placement."""
    from ssd_object_detection_tpu.train.step import TrainState

    params = shard_params_tp(state.params, mesh, min_channels)

    def place_opt(leaf):
        # optax moments mirror param shapes; reuse the same rule
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[-1] >= min_channels \
                and leaf.shape[-1] % mesh.shape["model"] == 0:
            spec = P(*([None] * (leaf.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    opt_state = jax.tree.map(place_opt, state.opt_state)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(step=step, params=params, opt_state=opt_state)


def shard_batch_2d(batch: Any, mesh: Mesh) -> Any:
    """Shard batch leaves on axis 0 over 'data' (replicated over 'model')."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, batch)
