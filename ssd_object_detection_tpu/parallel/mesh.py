"""Device mesh + sharding for data-parallel SSD training over ICI.

The reference has zero distributed support (single-device eager loop; SURVEY.md
section 2 parallelism table). The TPU-native design scales by GSPMD: build a 1-D
`Mesh(('data',))` over the slice, shard every batch leaf on axis 0, replicate params,
and run the SAME jitted train step — XLA propagates shardings through matcher, model,
and loss, and inserts the gradient all-reduce over ICI automatically.

Hard-negative-mining note (SURVEY.md section 7, step 8): the reference's top-k
threshold is computed over the whole flattened batch. Under GSPMD this semantics is
preserved exactly — the loss's sort runs on the logical (global) shape, so XLA emits
the necessary cross-chip collectives. There is no per-shard approximation.

Model size makes pure DP the right decomposition (38M params ≈ 150 MB fp32 — replicable
on every chip; activations dominate). TP/PP have no payoff at this scale (SURVEY.md
section 2); the mesh helper still accepts an `extra_axes` hook so a 2-D (data, model)
mesh can be formed for experimentation.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data", devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` local devices (default all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard every array leaf along its leading (batch) axis."""

    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def device_prefetch(
    iterator,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    depth: int = 2,
):
    """Yield device-resident batches up to `depth` steps ahead of the consumer.

    Overlaps host batch assembly + H2D transfer with device compute (jax.device_put
    is async): while the train step for batch N runs, batches N+1..N+depth are
    already in flight. Depth > 1 matters on high-latency host->device links (a
    tunneled TPU, a feed-bound pipeline): one queued transfer hides only compute,
    two also hide the host's next batch-assembly gap, keeping the link busy
    end-to-end. With a mesh, batches are sharded along the leading axis; otherwise
    placed on the default device.
    """
    from collections import deque

    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")

    def put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh, axis_name)
        return jax.tree.map(jax.device_put, batch)

    pending = deque()
    for batch in iterator:
        pending.append(put(batch))
        if len(pending) > depth:
            yield pending.popleft()
    while pending:
        yield pending.popleft()
