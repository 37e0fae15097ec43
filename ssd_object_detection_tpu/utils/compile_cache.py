"""Persistent XLA compilation cache setup, shared by every entry point.

On this platform a cold compile of the full model takes minutes (1-vCPU host /
axon tunnel); the persistent cache makes warm re-runs start in seconds. One
helper so the cache dir and threshold cannot drift between entry points
(bench.py, __graft_entry__.py, tests/conftest.py, tests/_multihost_worker.py).
Harmless if the backend doesn't support it.
"""

import os

CACHE_DIR = "~/.cache/jax_ssd_tests"
MIN_COMPILE_TIME_SECS = 2.0


def enable_compile_cache() -> None:
    """Call after `import jax`, before the first jit compilation.

    Also makes ``JAX_PLATFORMS`` actually binding: the axon TPU plugin ignores
    the env filter and initializes its backend anyway, which *hangs* (not
    fails) when the tunnel is down — so ``JAX_PLATFORMS=cpu python tools/...``
    would stall at first device use. Forcing the jax config (what
    tests/conftest.py does) restores the documented env-var semantics for
    every entry point that calls this helper.
    """
    import jax

    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        jax.config.update("jax_platforms", platforms)
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(CACHE_DIR))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", MIN_COMPILE_TIME_SECS
    )
