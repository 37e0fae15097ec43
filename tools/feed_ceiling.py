"""Train-feed ceiling measurement (round-4 VERDICT item 6).

The 10k trainings in round 4 sustained ~6.5 steps/s end-to-end against a 53.8 ms
device step (594 img/s) — feed-bound, not device-bound. This harness separates
the three ceilings that bound packed-cache train throughput on a given host and
measures where the end-to-end number actually lands against them:

  device : jitted train-step time with the batch ALREADY device-resident
           (BASELINE config #3: on-device matching + mining + loss + Adam);
  link   : host->device transfer of one training batch (uint8 images + GT
           arrays) over whatever connects host and chip — the axon tunnel in
           this environment, PCIe on a TPU VM;
  host   : pure batch-assembly rate of the packed-cache pipeline
           (np.memmap fancy-index copies + flip; data/packed.py).

Then end-to-end steps/s is measured at device_prefetch depths {1, 2, 4}
(parallel/mesh.device_prefetch: depth batches in flight, jax.device_put is
async so transfer overlaps compute). The gap between e2e and max(device, link,
host) is the non-overlapped residual.

Counterpart in the reference: none — its input pipeline is three nested python
generators with host-side matching (reference models/ssd_model.py:209-227,
data_loaders/ssd/make_dataset.py:48-68); SURVEY.md section 3.1 names it the
input-side hot loop. This harness exists because the TPU-native design moved
all of that on device, leaving the LINK as the only remaining feed cost worth
accounting for.

Usage:
    python tools/feed_ceiling.py config/feed_ceiling.yml --out FEED_CEILING.json
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import numpy as np


DEVICE_KEYS = ("image", "gt_cls", "gt_boxes", "gt_valid")  # what _run_phase ships


def batch_nbytes(batch):
    return int(sum(batch[k].nbytes for k in DEVICE_KEYS))


def sync(tree):
    """True sync through the axon tunnel: a device->host scalar fetch (
    jax.block_until_ready does not synchronize through the tunnel; BASELINE.md
    round-1 methodology note)."""
    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", type=str)
    p.add_argument("--steps", type=int, default=40, help="timed steps per cell")
    p.add_argument("--depths", type=str, default="1,2,4")
    p.add_argument("--out", type=str, default="FEED_CEILING.json")
    args = p.parse_args()

    from ssd_object_detection_tpu.config import load_config
    from ssd_object_detection_tpu.parallel.mesh import device_prefetch
    from ssd_object_detection_tpu.train.loop import Trainer
    from ssd_object_detection_tpu.train.step import create_train_state

    cfg = load_config(args.config)
    trainer = Trainer(cfg, run_dir="/tmp/feed_ceiling_run")
    state = create_train_state(trainer.params, trainer.main_tx)
    step_fn = trainer.main_step
    mesh = trainer.mesh

    def put(batch):
        sub = {k: batch[k] for k in DEVICE_KEYS}
        if mesh is not None:
            from ssd_object_detection_tpu.parallel.mesh import shard_batch

            return shard_batch(sub, mesh)
        return jax.tree.map(jax.device_put, sub)

    source = trainer._make_train_source()  # builds/verifies the packed cache
    batches = [dict(b) for b in source]  # one epoch materialized on host
    n_steps = min(args.steps, len(batches) - 1)
    bpb = batch_nbytes(batches[0])
    print(f"epoch: {len(batches)} batches, {bpb / 1e6:.2f} MB/batch to device")

    results = {}

    # ---- host ceiling: pure batch assembly (memmap reads + flip), no device
    t0 = time.perf_counter()
    n_host = 0
    for b in source:
        n_host += 1
    host_s_per_batch = (time.perf_counter() - t0) / max(n_host, 1)
    results["host_assembly_ms_per_batch"] = round(host_s_per_batch * 1000, 2)

    # ---- device ceiling: batch resident, loop the step (donate_state recreates
    # state each call; metrics fetch is the sync)
    jb = put(batches[0])
    for _ in range(3):  # compile + warm
        state, metrics = step_fn(state, jb)
    sync(metrics)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step_fn(state, jb)
    sync(metrics)
    dev_s = (time.perf_counter() - t0) / n_steps
    results["device_ms_per_step"] = round(dev_s * 1000, 2)

    # ---- link ceiling: H2D of K distinct batches, synced by fetching one byte
    # from EACH transferred image (forces arrival of all of them)
    K = 8
    put_batches = [put(batches[i + 1]) for i in range(K)]
    for b in put_batches:
        sync(b["image"])  # warm path + discard first-transfer handshake
    t0 = time.perf_counter()
    put_batches = [put(batches[i + 1 + K]) for i in range(K)]
    for b in put_batches:
        sync(b["image"])
    link_s = (time.perf_counter() - t0) / K
    results["link_ms_per_batch"] = round(link_s * 1000, 2)
    results["link_mb_per_s"] = round(bpb / link_s / 1e6, 1)

    # ---- end-to-end at each prefetch depth (fresh iteration over the epoch;
    # first 3 steps excluded as pipeline fill/warm)
    e2e = {}
    for depth in (int(d) for d in args.depths.split(",") if d):
        stream = ({k: b[k] for k in DEVICE_KEYS} for b in batches)
        it = device_prefetch(stream, mesh, depth=depth)
        for _ in range(3):
            state, metrics = step_fn(state, next(it))
        sync(metrics)
        t0 = time.perf_counter()
        n = 0
        for jbatch in it:
            state, metrics = step_fn(state, jbatch)
            n += 1
            if n >= n_steps:
                break
        sync(metrics)
        s_per_step = (time.perf_counter() - t0) / n
        e2e[f"depth_{depth}"] = {
            "ms_per_step": round(s_per_step * 1000, 2),
            "steps_per_s": round(1.0 / s_per_step, 2),
            "img_per_s": round(cfg.model.train.batch_size / s_per_step, 1),
        }
    results["e2e_by_prefetch_depth"] = e2e

    floors = {
        "device": results["device_ms_per_step"],
        "link": results["link_ms_per_batch"],
        "host": results["host_assembly_ms_per_batch"],
    }
    binding = max(floors, key=floors.get)
    best = min(v["ms_per_step"] for v in e2e.values())
    results["floors_ms"] = floors
    results["binding_resource"] = binding
    results["best_e2e_ms_per_step"] = best
    results["overlap_residual_ms"] = round(best - floors[binding], 2)

    doc = {
        "what": (
            "train-feed ceiling separation (VERDICT round-4 item 6): device-bound "
            "step time (batch resident) vs link transfer time vs host batch "
            "assembly, against measured end-to-end packed-cache training at "
            "device_prefetch depths — all cells back-to-back on an otherwise idle "
            "host, same jitted step"
        ),
        "config": args.config,
        "variant": cfg.model.variant,
        "batch_size": cfg.model.train.batch_size,
        "bytes_per_batch": bpb,
        "device": str(jax.devices()[0]),
        "note": (
            "the link floor is environment-specific: this host reaches the chip "
            "through the axon tunnel; on a TPU VM (PCIe v4 ~16 GB/s) the same "
            f"{bpb / 1e6:.1f} MB batch transfers in ~{bpb / 16e9 * 1000:.2f} ms "
            "and the binding resource becomes the device step"
        ),
        **results,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
