"""Worker process for the two-process multi-host test (not collected by pytest).

Usage: python tests/_multihost_worker.py <coordinator_addr> <num_processes> <pid>

Each worker gets 4 virtual CPU devices; two workers form an 8-device global mesh
via jax.distributed. The worker builds the SAME deterministic tiny model + batch as
tests/test_parallel.py's tiny_setup, takes its host_shard_range slice, assembles
the global batch with make_global_batch, runs ONE data-parallel train step, and
prints the loss for the parent test to compare against the single-process value.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# deterministic thunk scheduling: same collective-ordering deadlock guard as
# tests/conftest.py (multi-device CPU meshes + one thread per virtual device)
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4"
    " --xla_cpu_enable_concurrency_optimized_scheduler=false"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from ssd_object_detection_tpu.parallel.multihost import (
        host_shard_range,
        initialize_distributed,
        make_global_batch,
    )

    initialize_distributed(coordinator, n_proc, pid)
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * n_proc, jax.device_count()

    # disjoint/covering host shards of the 8-sample global batch
    r = host_shard_range(8)
    per = 8 // n_proc
    assert r == range(pid * per, 8 if pid == n_proc - 1 else (pid + 1) * per), r
    print(f"SHARD {pid} {r.start} {r.stop}", flush=True)

    from ssd_object_detection_tpu.data.synthetic import SyntheticDetectionDataset
    from ssd_object_detection_tpu.models.ssd import SSD
    from ssd_object_detection_tpu.ops.anchors import generate_anchors
    from ssd_object_detection_tpu.parallel.mesh import make_mesh, replicate
    from ssd_object_detection_tpu.train.optim import make_optimizer
    from ssd_object_detection_tpu.train.step import (
        StepConfig,
        create_train_state,
        make_train_step,
    )
    from tests.test_train_step import NUM_CLASSES, TINY_ANCHORS, TINY_MODEL

    model = SSD(num_classes=NUM_CLASSES, spec=TINY_MODEL)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    anchors = generate_anchors(TINY_ANCHORS)
    tx = make_optimizer("adam", 1e-3)
    step_fn = make_train_step(model.apply, anchors, tx, StepConfig())
    ds = SyntheticDetectionDataset(num_images=8, image_size=64, max_gt=4, num_classes=8, seed=5)
    batch = next(ds.batches(batch_size=8))  # deterministic full batch on every host

    local = {k: np.asarray(v)[r.start : r.stop] for k, v in batch.items()}
    mesh = make_mesh()  # all 8 global devices
    assert mesh.size == 4 * n_proc
    gb = make_global_batch(local, mesh)
    assert gb["image"].shape == batch["image"].shape  # global logical shape

    state = replicate(create_train_state(params, tx), mesh)
    state, metrics = step_fn(state, gb)
    loss = float(metrics["loss"])  # fully-replicated scalar: addressable everywhere
    npos = float(metrics["num_positive"])
    print(f"RESULT {pid} loss={loss:.8f} npos={npos:.0f}", flush=True)


if __name__ == "__main__":
    main()
