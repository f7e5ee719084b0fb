"""Cached jitted scalar/batch kernels for host-side orchestration loops.

The triangulator/merge/filter loops evaluate single-observation line errors
thousands of times; eager jnp dispatch costs ~1 ms per call while a cached
jitted kernel costs ~30 us.  Kernels are cached per (camera model, arity).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from privacy_preserving_sfm_tpu.ops import lines as line_ops

_CACHE: Dict[Tuple, Callable] = {}


def squared_pixel_error_kernel(camera_model: str) -> Callable:
    """(line (3,), xyz (3,), proj (3,4), params (P,), w, h) -> scalar."""
    key = ("pix", camera_model)
    if key not in _CACHE:
        _CACHE[key] = jax.jit(
            lambda line, xyz, proj, params, w, h:
            line_ops.squared_line_reprojection_error(
                line, xyz, proj, camera_model, params, w, h),
            static_argnums=(4, 5))
    return _CACHE[key]


def angular_error_kernel(camera_model: str) -> Callable:
    key = ("ang", camera_model)
    if key not in _CACHE:
        _CACHE[key] = jax.jit(
            lambda line, xyz, proj, params, w, h:
            line_ops.line_angular_error(
                line, xyz, proj, camera_model, params, w, h),
            static_argnums=(4, 5))
    return _CACHE[key]


def batch_pixel_error_kernel(camera_model: str) -> Callable:
    """(lines (N,3), xyz (3,), projs (N,3,4), params (N,P), w, h) -> (N,)."""
    key = ("pixb", camera_model)
    if key not in _CACHE:
        _CACHE[key] = jax.jit(
            lambda lines, xyz, projs, params, w, h:
            line_ops.squared_line_reprojection_error(
                lines, xyz[None], projs, camera_model, params, w, h),
            static_argnums=(4, 5))
    return _CACHE[key]
