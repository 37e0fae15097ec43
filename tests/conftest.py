"""Test harness: run everything on a virtual 8-device CPU mesh (hermetic, CI-able).

Must set the XLA flags before jax initializes, hence the env mutation at import time.
Multi-chip sharding tests use these 8 virtual CPU devices (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
# Deterministic thunk scheduling (round-3/4 full-suite SIGABRT root cause): with
# the concurrency-optimized scheduler, XLA:CPU executes independent thunks in
# nondeterministic order, so on a 2-D (dp, tp) mesh different virtual devices can
# enter a program's two independent collectives (grad all-reduce over 'data',
# all-gather over 'model') in DIFFERENT orders. Each device has one execution
# thread; inconsistent ordering is a circular wait, the in-process communicator's
# 40 s termination timeout fires, and tsl CHECK-aborts the whole pytest process
# (reproduced 3/3 at test_parallel.py::test_2d_mesh_dp_tp_step_matches_single_device,
# rendezvous.cc "Terminating to ensure a consistent program state", exit 134;
# telemetry ruled out RSS/fd/thread exhaustion). Program-order execution makes the
# collective order consistent across devices. CPU-test-harness-only: on real TPU
# the compiler schedules collectives deterministically per program order.
if "xla_cpu_enable_concurrency_optimized_scheduler" not in xla_flags:
    xla_flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = xla_flags

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env filter; force the config too.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles are minutes-long on a 1-vCPU host and
# the suite re-compiles the same programs every run.
from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

# ---------------------------------------------------------------------------
# Per-test resource telemetry (diagnosis aid for the round-3 full-suite SIGABRT:
# the suite aborted reproducibly at ~175 tests inside an Array fetch; this trail
# shows whether RSS / fd / thread counts were climbing toward a limit). Enabled
# only when SSD_TEST_TELEMETRY points at a writable path; zero cost otherwise.
# ---------------------------------------------------------------------------
_TELEMETRY = os.environ.get("SSD_TEST_TELEMETRY")
if _TELEMETRY:
    import json

    import psutil
    import pytest

    _proc = psutil.Process()

    @pytest.fixture(autouse=True)
    def _resource_trail(request):
        yield
        try:
            mem = _proc.memory_info()
            with open(_TELEMETRY, "a") as f:
                f.write(
                    json.dumps(
                        {
                            "test": request.node.nodeid,
                            "rss_mb": round(mem.rss / 1e6, 1),
                            "vms_mb": round(mem.vms / 1e6, 1),
                            "fds": _proc.num_fds(),
                            "threads": _proc.num_threads(),
                            "children": len(_proc.children(recursive=True)),
                        }
                    )
                    + "\n"
                )
        except Exception:
            pass
