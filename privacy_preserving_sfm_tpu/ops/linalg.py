"""Closed-form small-matrix kernels (batched, TPU-friendly).

``jnp.linalg.*`` routes tiny dense problems through generic LAPACK-style
lowerings that are slow (or fragile) on TPU; every solver in this framework
needs only 2x2/3x3/4x4 systems, so we provide explicit cofactor/Cramer
kernels that fuse into surrounding elementwise code.  All functions
broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def det2(A: jax.Array) -> jax.Array:
    return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]


def det3(A: jax.Array) -> jax.Array:
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def adjugate3(A: jax.Array) -> jax.Array:
    """Adjugate (transposed cofactor matrix) of 3x3 A."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    adj = jnp.stack(
        [
            e * i - f * h, c * h - b * i, b * f - c * e,
            f * g - d * i, a * i - c * g, c * d - a * f,
            d * h - e * g, b * g - a * h, a * e - b * d,
        ],
        axis=-1,
    )
    return adj.reshape(A.shape)


def solve2(A: jax.Array, b: jax.Array, eps: float = 1e-30) -> jax.Array:
    """Solve 2x2 systems A x = b by Cramer's rule. (..., 2, 2), (..., 2)."""
    det = det2(A)
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    x0 = (A[..., 1, 1] * b[..., 0] - A[..., 0, 1] * b[..., 1]) / det
    x1 = (A[..., 0, 0] * b[..., 1] - A[..., 1, 0] * b[..., 0]) / det
    return jnp.stack([x0, x1], axis=-1)


def solve3(A: jax.Array, b: jax.Array, eps: float = 1e-30) -> jax.Array:
    """Solve 3x3 systems A x = b via the adjugate. (..., 3, 3), (..., 3)."""
    det = det3(A)
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    return jnp.einsum("...ij,...j->...i", adjugate3(A), b) / det[..., None]


def inv3(A: jax.Array, eps: float = 1e-30) -> jax.Array:
    det = det3(A)
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    return adjugate3(A) / det[..., None, None]


def solve_spd(A: jax.Array, b: jax.Array, damping: float = 0.0) -> jax.Array:
    """Solve small SPD systems via Cholesky-free normal-equation Cramer.

    For n <= 3 uses the closed forms above; larger systems should use the
    blocked solvers in ``optim/``.
    """
    n = A.shape[-1]
    if damping:
        A = A + damping * jnp.eye(n, dtype=A.dtype)
    if n == 2:
        return solve2(A, b)
    if n == 3:
        return solve3(A, b)
    raise ValueError(f"solve_spd only supports n<=3, got {n}")


def lstsq_normal3(A: jax.Array, b: jax.Array, reg_scale: float = 1e-12,
                  refine: int = 1) -> jax.Array:
    """Least-squares solve of tall (..., N, 3) systems via normal equations.

    A trace-scaled Levenberg floor keeps rank-deficient stacks finite, and
    ``refine`` rounds of iterative refinement recover fp32 accuracy.
    """
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    Atb = jnp.einsum("...ni,...n->...i", A, b)
    reg = reg_scale * jnp.trace(AtA, axis1=-2, axis2=-1)
    eye = jnp.eye(3, dtype=A.dtype)
    AtA_r = AtA + (reg[..., None, None] + 1e-30) * eye
    x = solve3(AtA_r, Atb)
    for _ in range(refine):
        r = Atb - jnp.einsum("...ij,...j->...i", AtA, x)
        x = x + solve3(AtA_r, r)
    return x
