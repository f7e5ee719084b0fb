"""Process-level JAX configuration helpers.

The incremental pipeline compiles a bounded family of bucketed kernels
(init, P6L, triangulation, BA); with XLA's persistent compilation cache
enabled those compiles happen once per machine instead of once per
process.  Called by the CLI entry point and the test harness.
"""

from __future__ import annotations

import os


def _machine_tag() -> str:
    """Short fingerprint of the host CPU feature set.

    XLA:CPU persists AOT executables specialized to the compile host's
    ISA features; loading them on a machine with a different feature set
    SIGILLs/segfaults (observed: a round-2 cache entry crashed the round-3
    test suite after the session moved hosts).  Scoping the cache dir by
    this tag makes stale cross-machine entries unreachable.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        " ".join(sorted(line.split()[2:]))
                        .encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return platform.machine()


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "PPSFM_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     f"ppsfm_jax_{_machine_tag()}"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
