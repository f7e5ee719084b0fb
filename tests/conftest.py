"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Tests run on the CPU backend (with a virtual 8-device mesh for the
multi-chip sharding tests) so they are hermetic and fast; the bench and the
driver's compile checks exercise the real TPU path.

NOTE: the environment may pin ``JAX_PLATFORMS`` to a TPU plugin at the
process level, so the platform must be overridden through ``jax.config``
(env vars are already consumed by the time conftest runs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the mapper's bucketed kernels compile
# once per machine, not once per test process.
from privacy_preserving_sfm_tpu.utils.jax_setup import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test")
