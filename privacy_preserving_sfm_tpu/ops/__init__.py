"""Batched geometry kernels (pure JAX, jit/vmap-friendly).

Everything in this package is a pure function over arrays with static shapes;
no Python-level data-dependent control flow, so every op can live under
``jax.jit`` / ``jax.vmap`` / ``shard_map``.
"""

from privacy_preserving_sfm_tpu.ops import lie  # noqa: F401
from privacy_preserving_sfm_tpu.ops import cameras  # noqa: F401
from privacy_preserving_sfm_tpu.ops import lines  # noqa: F401
from privacy_preserving_sfm_tpu.ops import triangulation  # noqa: F401
