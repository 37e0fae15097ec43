"""Multi-host (multi-process) support for pod-scale data parallelism.

Single-slice multi-chip DP needs nothing beyond parallel/mesh.py (XLA collectives ride
ICI within the slice). Across hosts, each process must (a) initialize the JAX
distributed runtime, (b) load a DISJOINT shard of the dataset, and (c) assemble
global arrays from per-host shards. These helpers cover that; they are exercised in
single-process mode by tests (multi-host hardware is not available in this
environment — the code paths degrade to no-ops at process_count()==1).

Validated at process_count() == 2:
tests/test_parallel.py::test_multihost_two_process_dp_step launches two REAL
processes (jax.distributed.initialize over a local coordinator, 4 virtual CPU
devices each), asserts the host shards are disjoint and covering, assembles the
global batch with make_global_batch, and checks the one-step DP loss equals the
single-process 8-device run. Multi-host TPU pods reuse exactly these code paths;
only the transport (DCN vs localhost gRPC) differs.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with no-op fallback for single-process runs."""
    if num_processes is None or num_processes <= 1:
        logger.info("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info("distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def host_shard_range(total: int) -> range:
    """This process's contiguous slice of a dataset of `total` records."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = total // n_proc
    start = pid * per
    end = total if pid == n_proc - 1 else start + per
    return range(start, end)


def make_global_batch(local_batch: Dict[str, np.ndarray], mesh: Mesh,
                      axis_name: str = "data") -> Dict[str, Any]:
    """Assemble a globally-sharded batch from this host's local shard.

    Each host contributes `local_batch` (its slice of the global batch along axis 0);
    the returned arrays have global shape process_count()*local leading dim, sharded
    over the mesh. Single-process: equivalent to shard_batch.
    """
    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        sharding = NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))
        local_devices = mesh.local_devices
        per_device = x.shape[0] // len(local_devices)
        arrays = [
            jax.device_put(x[i * per_device:(i + 1) * per_device], d)
            for i, d in enumerate(local_devices)
        ]
        return jax.make_array_from_single_device_arrays(global_shape, sharding, arrays)

    return {k: put(v) for k, v in local_batch.items()}
