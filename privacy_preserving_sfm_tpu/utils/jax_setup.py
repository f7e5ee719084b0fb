"""Process-level JAX configuration helpers.

The incremental pipeline compiles a bounded family of bucketed kernels
(init, P6L, triangulation, BA); with XLA's persistent compilation cache
enabled those compiles happen once per machine instead of once per
process.  Called by the CLI entry point and the test harness.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "PPSFM_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ppsfm_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
