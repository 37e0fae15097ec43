"""Model introspection + profiling (reference component 17, SURVEY.md section 2).

The reference exports a one-shot TensorBoard graph trace at model init
(models/ssd_model.py:65-72) and has show_summary() printing the Keras summary + a
plot_model PNG (:398-403). TPU-native equivalents:

  - `param_summary`: per-module parameter table + totals (the Keras-summary analog);
  - `flops_analysis`: XLA's own cost model for a jitted fn (FLOPs/bytes accessed) via
    lowered.compile().cost_analysis() — stronger than a graph picture;
  - `trace`: context manager around jax.profiler producing an XPlane trace viewable in
    TensorBoard/xprof (the graph-trace analog, plus real timing).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, List, Tuple

import jax
import numpy as np


def param_summary(params: Any) -> str:
    """Human-readable per-module parameter table (Keras model.summary() analog)."""
    rows: List[Tuple[str, str, int]] = []

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        rows.append((name, str(tuple(leaf.shape)), int(np.prod(leaf.shape))))

    total = sum(r[2] for r in rows)
    width = max(len(r[0]) for r in rows) + 2
    lines = [f"{'param':<{width}}{'shape':<20}{'count':>12}", "-" * (width + 32)]
    for name, shape, count in rows:
        lines.append(f"{name:<{width}}{shape:<20}{count:>12,}")
    lines.append("-" * (width + 32))
    lines.append(f"{'TOTAL':<{width}}{'':<20}{total:>12,}")
    return "\n".join(lines)


def flops_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """XLA cost analysis of a jittable fn: FLOPs, bytes accessed, etc."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return {k: float(v) for k, v in cost.items() if isinstance(v, (int, float))}


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region into an XPlane trace for TensorBoard/xprof
    (replaces the reference's tf.summary graph trace with actual timing data)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
