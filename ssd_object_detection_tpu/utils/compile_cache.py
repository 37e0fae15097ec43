"""Persistent XLA compilation cache setup, shared by every entry point.

On this platform a cold compile of the full model takes minutes (1-vCPU host /
axon tunnel); the persistent cache makes warm re-runs start in seconds. One
helper so the cache dir and threshold cannot drift between entry points
(bench.py, __graft_entry__.py, tests/conftest.py, tests/_multihost_worker.py).
Harmless if the backend doesn't support it.
"""

import hashlib
import os

CACHE_DIR = "~/.cache/jax_ssd_tests"
MIN_COMPILE_TIME_SECS = 2.0


def _machine_fingerprint() -> str:
    """Short digest of the host's CPU feature flags.

    XLA:CPU AOT results are machine-code; its persistent-cache key does NOT cover
    the target machine features, so a cache written on one host can hand a later
    host executables using unsupported instructions (the loader only warns:
    "Machine type used for XLA:CPU compilation doesn't match ... could lead to
    execution errors such as SIGILL"). On this platform the VM's CPU model
    changes between sessions, and a poisoned entry aborts the process mid-suite
    (round-3 full-suite SIGABRT at an Array fetch). Scoping the cache dir by CPU
    flags makes a new machine start a fresh cache instead of executing stale
    machine code.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


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
    cache_dir = os.path.expanduser(f"{CACHE_DIR}-{_machine_fingerprint()}")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", MIN_COMPILE_TIME_SECS
    )
