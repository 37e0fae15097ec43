"""Test harness: run everything on a virtual 8-device CPU mesh (hermetic, CI-able).

Must set the XLA flags before jax initializes, hence the env mutation at import time.
Multi-chip sharding tests use these 8 virtual CPU devices (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env filter; force the config too.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles are minutes-long on a 1-vCPU host and
# the suite re-compiles the same programs every run.
from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
