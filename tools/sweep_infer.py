"""Inference throughput sweep: s2d stem on/off x batch size, forward-only vs full predict.

Measurement methodology per memory/BASELINE.md: dispatch loop ended by a scalar fetch
(block_until_ready does not synchronize through the axon tunnel); inputs device-resident.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, sync, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="32,64,128")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from ssd_object_detection_tpu.eval.predict import make_predict_fn
    from ssd_object_detection_tpu.models.ssd import SSD, SSD300_SPEC_MODEL
    from ssd_object_detection_tpu.ops.anchors import generate_anchors

    anchors = generate_anchors(SSD300_SPEC_MODEL.anchor_spec)
    m_plain = SSD(num_classes=81, spec=SSD300_SPEC_MODEL, dtype=jnp.bfloat16, s2d_stem=False)
    m_s2d = SSD(num_classes=81, spec=SSD300_SPEC_MODEL, dtype=jnp.bfloat16, s2d_stem=True)
    params = m_plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))

    # warm up the device->host fetch path once (first fetch pays ~45s handshake)
    x0 = jnp.zeros((), jnp.float32) + 1
    float(x0)

    results = []
    for bs in [int(b) for b in args.batches.split(",")]:
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(0, 1, (bs, 300, 300, 3)).astype(np.float32))
        for name, model in (("plain", m_plain), ("s2d", m_s2d)):
            fwd = jax.jit(lambda p, x, m=model: m.apply(p, (x - 0.5) * 2.0))
            t_fwd = time_fn(lambda: fwd(params, images), lambda o: float(o[0][0, 0, 0]),
                            iters=args.iters)
            predict = make_predict_fn(model.apply, anchors)
            t_pred = time_fn(lambda: predict(params, images),
                             lambda o: float(o.scores[0, 0]), iters=args.iters)
            r = {"batch": bs, "stem": name,
                 "fwd_ms": round(t_fwd * 1e3, 2), "fwd_img_s": round(bs / t_fwd, 1),
                 "pred_ms": round(t_pred * 1e3, 2), "pred_img_s": round(bs / t_pred, 1)}
            results.append(r)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
