"""Process-level JAX configuration helpers.

The incremental pipeline compiles a bounded family of bucketed kernels
(init, P6L, triangulation, BA); with XLA's persistent compilation cache
enabled those compiles happen once per machine instead of once per
process.  Called by the CLI entry point and the test harness.
"""

from __future__ import annotations

import os


def _machine_tag() -> str:
    """Short fingerprint of the host CPU feature set + effective ISA cap.

    XLA:CPU persists AOT executables specialized to the compile host's
    ISA features; loading them on a machine with a different feature set
    SIGILLs/segfaults (observed: a round-2 cache entry crashed the round-3
    test suite after the session moved hosts).  Scoping the cache dir by
    this tag makes stale cross-machine entries unreachable.  The
    ``--xla_cpu_max_isa`` cap (the round-5 AVX512-miscompile mitigation,
    reports/sift_segv_r5.md) changes the generated code too, so it joins
    the fingerprint.
    """
    import hashlib

    isa = ""
    for tok in os.environ.get("XLA_FLAGS", "").split():
        if "xla_cpu_max_isa" in tok:
            isa = tok.split("=")[-1]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        (" ".join(sorted(line.split()[2:])) + isa)
                        .encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return platform.machine() + isa


def enable_persistent_cache(path: str | None = None) -> str:
    """Enable XLA's persistent compile cache, scoped so stale entries are
    unreachable rather than deserialized-and-crashed.

    Scope key = CPU-ISA fingerprint + jaxlib version + x64 flag: round 4
    observed a segfault inside ``jax/_src/compilation_cache.py`` while
    deserializing an entry written under a different configuration; the
    cache key jax computes does not cover every axis that matters on this
    backend, so we partition the directory instead.  Thresholds sit at
    jax's defaults (min_compile_time 1.0 s) instead of round 3's
    aggressive 0.2 s/0 bytes — tiny entries cost more in (risky) reads
    than they save in compiles.
    """
    import jax
    import jaxlib

    x64 = "x64" if jax.config.jax_enable_x64 else "x32"
    tag = f"{_machine_tag()}_{jaxlib.__version__}_{x64}"
    path = path or os.environ.get(
        "PPSFM_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", f"ppsfm_jax_{tag}"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
