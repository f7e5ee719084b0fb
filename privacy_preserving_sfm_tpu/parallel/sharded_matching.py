"""Descriptor matching sharded over image pairs.

Exhaustive matching is embarrassingly parallel over pairs
(``matching.cc:436-498`` block loop); across a device mesh each device
matches its pair shard against a replicated descriptor table — a pure map
with no collectives (the reference's multi-GPU matcher thread pool,
``matching.cc:330-349``, re-expressed as shard_map).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from privacy_preserving_sfm_tpu.features import matching


def match_pairs_sharded(desc: jax.Array, valid: jax.Array,
                        pairs: jax.Array, mesh: Mesh, axis: str = "shard",
                        **kwargs):
    """Match a (B, 2) pair list sharded over the mesh axis.

    desc: (I, N, 128) replicated descriptor tables; pairs padded so that
    B % mesh.shape[axis] == 0 (pad with [0, 0] pairs and ignore them).
    Returns MatchResult with leading axis B (sharded layout preserved).
    """

    def kernel(desc_l, valid_l, pairs_l):
        return matching.match_many_pairs(desc_l, valid_l, pairs_l, **kwargs)

    f = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=matching.MatchResult(P(axis), P(axis), P(axis)))
    return f(desc, valid, pairs)


def exhaustive_pair_list(num_images: int, block_size: int = 50) -> np.ndarray:
    """All unordered pairs, grouped in blocks like the reference scheduler
    (``matching.h:50-51``, ``matching.cc:436-498``)."""
    pairs = []
    for start1 in range(0, num_images, block_size):
        end1 = min(start1 + block_size, num_images)
        for start2 in range(0, num_images, block_size):
            end2 = min(start2 + block_size, num_images)
            for i in range(start1, end1):
                for j in range(start2, end2):
                    if i < j:
                        pairs.append((i, j))
    # Deduplicate while keeping block order (reference dedup logic).
    seen = set()
    out = []
    for p in pairs:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return np.asarray(out, np.int32)


def sequential_pair_list(num_images: int, overlap: int = 10,
                         quadratic_overlap: bool = True) -> np.ndarray:
    """Sequential matcher pair list (``matching.h:279-310``): each image
    matches the next ``overlap`` frames, plus quadratically-spaced jumps."""
    pairs = set()
    for i in range(num_images):
        for k in range(1, overlap + 1):
            if i + k < num_images:
                pairs.add((i, i + k))
            if quadratic_overlap:
                j = i + (1 << k)
                if j < num_images:
                    pairs.add((i, j))
    return np.asarray(sorted(pairs), np.int32)
