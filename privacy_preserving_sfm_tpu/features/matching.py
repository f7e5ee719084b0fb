"""Descriptor matching: exact batched top-2 with ratio/distance/cross checks.

Semantics of the reference CPU brute-force matcher (``src/feature/sift.cc:
54-143, 251-351``): descriptors are uint8 quantizations of 512 * L1-root
normalized SIFT vectors; similarity is the dot product scaled by 1/512^2 and
mapped through acos to an angular distance; a match survives if

  * best_dist < max_distance            (0.7 rad default)
  * best_dist < max_ratio * second_dist (0.8 default)
  * cross check: mutual nearest neighbors (cross_check=true)

The FLANN path (4 kd-trees, 128 checks) is an *approximation* of exactly
this; on TPU the exact (N1, 128) @ (128, N2) matmul rides the MXU and needs
no trees.  Pairs with < min_num_matches matches are zeroed by the caller
(``matching.cc:414-416``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

DIST_NORM = 1.0 / (512.0 * 512.0)
BIG = 1e9


class MatchResult(NamedTuple):
    matches: jax.Array  # (N1,) int32 index into image 2, -1 = no match
    num_matches: jax.Array  # () int32
    best_dist: jax.Array  # (N1,) angular distance of the best candidate


def descriptor_dots(desc1: jax.Array, desc2: jax.Array) -> jax.Array:
    """Raw dot-product matrix d1 . d2, (N1, N2) f32 (LARGER = closer).

    Inputs are uint8 descriptors; the matmul runs in f32 on the MXU
    (int8 inputs upcast — contraction dim 128 matches the MXU tile).
    """
    d1 = desc1.astype(jnp.float32)
    d2 = desc2.astype(jnp.float32)
    return jax.lax.dot_general(
        d1, d2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def descriptor_distances(desc1: jax.Array, desc2: jax.Array) -> jax.Array:
    """Angular distance matrix acos(clip(d1 . d2 / 512^2)). (N1,N2) f32."""
    return _to_angle(descriptor_dots(desc1, desc2))


def _to_angle(dots: jax.Array) -> jax.Array:
    return jnp.arccos(jnp.clip(dots * DIST_NORM, -1.0, 1.0))


def _top2_max(dots: jax.Array, axis: int):
    """Largest and second-largest along axis, with argmax of the largest.

    acos is monotonically decreasing, so the top-2 dots ARE the top-2
    nearest neighbors; the transcendental is applied to 2N scalars
    afterwards instead of the full N^2 matrix (which dominated CPU
    matching time).
    """
    best_idx = jnp.argmax(dots, axis=axis)
    best = jnp.max(dots, axis=axis)
    iota = jax.lax.broadcasted_iota(jnp.int32, dots.shape, axis)
    masked = jnp.where(iota == jnp.expand_dims(best_idx, axis), -BIG, dots)
    second = jnp.max(masked, axis=axis)
    return best, second, best_idx


def match_descriptors(
    desc1: jax.Array,
    desc2: jax.Array,
    valid1: Optional[jax.Array] = None,
    valid2: Optional[jax.Array] = None,
    max_ratio: float = 0.8,
    max_distance: float = 0.7,
    cross_check: bool = True,
) -> MatchResult:
    """Match uint8 SIFT descriptors (fixed shapes, padding masked).

    Defaults are ``SiftMatchingOptions`` (``sift.h:117-144``).
    """
    dots = descriptor_dots(desc1, desc2)  # (N1, N2), larger = closer
    if valid1 is not None:
        dots = jnp.where(valid1[:, None], dots, -BIG)
    if valid2 is not None:
        dots = jnp.where(valid2[None, :], dots, -BIG)

    bd12, sd12, idx12 = _top2_max(dots, axis=1)
    best12, second12 = _to_angle(bd12), _to_angle(sd12)
    ok = (best12 < max_distance) & (best12 < max_ratio * second12)

    if cross_check:
        bd21, sd21, idx21 = _top2_max(dots, axis=0)
        best21, second21 = _to_angle(bd21), _to_angle(sd21)
        ok21 = (best21 < max_distance) & (best21 < max_ratio * second21)
        mutual = (jnp.take(idx21, idx12) == jnp.arange(idx12.shape[0])) \
            & jnp.take(ok21, idx12)
        ok = ok & mutual

    matches = jnp.where(ok, idx12, -1)
    return MatchResult(matches=matches.astype(jnp.int32),
                       num_matches=jnp.sum(ok).astype(jnp.int32),
                       best_dist=best12)


def match_many_pairs(desc: jax.Array, valid: jax.Array,
                     pairs: jax.Array, **kwargs) -> MatchResult:
    """vmap matcher over a (B, 2) array of image-index pairs.

    desc: (I, N, 128) stacked per-image descriptor tables (padded);
    valid: (I, N).  Used by the exhaustive/sequential schedulers to batch
    whole blocks of pairs into one device call
    (block structure: ``matching.cc:436-498``).
    """
    def one(pair):
        return match_descriptors(desc[pair[0]], desc[pair[1]],
                                 valid[pair[0]], valid[pair[1]], **kwargs)

    return jax.vmap(one)(pairs)
