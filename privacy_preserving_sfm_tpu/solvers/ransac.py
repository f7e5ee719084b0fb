"""Device-resident vectorized RANSAC.

Semantics follow the reference framework (``src/optim/ransac.h:78-249``,
``loransac.h:54-238``, ``support_measurement.h:43-77``) but the execution
model is batched: B hypotheses are generated and scored in parallel instead
of a sequential loop.

Support comparison (reference `InlierSupportMeasurer::Compare`): more
inliers wins; equal inliers -> smaller inlier-residual sum wins.  We encode
this lexicographic order in a single float score
``num_inliers - rs / (1 + rs)`` (the second term is in [0, 1)).  MSAC
scoring (RansacLib, used by the init module) is ``-sum(min(r, thresh))``.

Data is fixed-shape and padded; a validity mask excludes padding from both
sampling and scoring.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: object  # best model pytree (leading batch dims stripped)
    score: jax.Array  # combined support score (higher better)
    num_inliers: jax.Array  # ()
    inlier_mask: jax.Array  # (N,)
    best_index: jax.Array  # hypothesis index, for debugging


def draw_samples(key: jax.Array, num_data: int, valid: jax.Array,
                 sample_size: int, num_hypotheses: int) -> jax.Array:
    """(B, k) index samples, distinct within a sample, valid-only.

    Gumbel top-k over masked logits: equivalent to uniform sampling of k
    distinct valid indices, fully batched (no per-hypothesis loop).
    """
    g = jax.random.gumbel(key, (num_hypotheses, num_data))
    logits = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(logits, sample_size)
    return idx


def inlier_score(residuals: jax.Array, threshold, valid: jax.Array):
    """Reference inlier-count support with residual-sum tiebreak.

    residuals: (..., N) squared residuals; valid: (N,) or (..., N).
    Returns (score, num_inliers, inlier_mask).
    """
    inlier = (residuals < threshold) & valid
    num = jnp.sum(inlier, axis=-1)
    rs = jnp.sum(jnp.where(inlier, residuals, 0.0), axis=-1)
    score = num.astype(residuals.dtype) - rs / (1.0 + rs)
    return score, num, inlier


def msac_score(residuals: jax.Array, threshold, valid: jax.Array):
    """RansacLib LO-MSAC truncated score (negated: higher is better)."""
    r = jnp.where(valid, jnp.minimum(residuals, threshold), 0.0)
    inlier = (residuals < threshold) & valid
    num = jnp.sum(inlier, axis=-1)
    return -jnp.sum(r, axis=-1), num, inlier


def select_best(models, score: jax.Array, num_inliers: jax.Array,
                inlier_mask: jax.Array) -> RansacResult:
    """Argmax over flattened hypothesis axes of a scored model batch.

    models: pytree with leading shape matching ``score``.
    """
    flat_score = score.reshape(-1)
    best = jnp.argmax(flat_score)

    def take(x):
        return x.reshape((-1,) + x.shape[score.ndim:])[best]

    return RansacResult(
        model=jax.tree_util.tree_map(take, models),
        score=flat_score[best],
        num_inliers=num_inliers.reshape(-1)[best],
        inlier_mask=inlier_mask.reshape((-1,) + inlier_mask.shape[score.ndim:])[best],
        best_index=best,
    )


def num_trials_needed(num_inliers, num_valid, sample_size: int,
                      confidence: float = 0.99999,
                      multiplier: float = 3.0,
                      max_trials: int = 1_000_000):
    """Adaptive trial bound ``log(1-conf)/log(1-ratio^m) * multiplier``.

    Mirror of ``ransac.h:158-176``; used by callers for between-batch
    early exit (host-side), not inside the jitted kernel.
    """
    ratio = jnp.clip(num_inliers / jnp.maximum(num_valid, 1), 1e-9, 1.0)
    nom = jnp.log(jnp.maximum(1.0 - confidence, 1e-300))
    denom = jnp.log1p(-jnp.clip(ratio ** sample_size, None, 1.0 - 1e-12))
    trials = multiplier * nom / jnp.minimum(denom, -1e-300)
    return jnp.minimum(trials, max_trials)
