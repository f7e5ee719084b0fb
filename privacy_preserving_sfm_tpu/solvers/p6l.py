"""P6L: absolute camera pose from 6 point-to-line correspondences.

Batched re-derivation of the reference minimal solver
(``src/estimators/absolute_pose.cc:79-162``):

  constraint   l_i^T (R X_i + t) = 0
  split        first 3 correspondences eliminate t, remaining 3 give
               homogeneous constraints on vec(R)
  rotation     Cayley parametrization -> 3Q3 problem -> ``ops/e3q3``
  output       up to 8 poses [R | t] per sample

plus the robust wrapper ``estimate_absolute_pose_from_lines``
(``src/estimators/pose.cc:52-94``: RANSAC, all-aligned sample rejection,
>90%-aligned-inlier degeneracy guard) and the LM pose refinement
(``pose.cc:96-213``: Cauchy loss, pixel-space line cost, points constant)
as a fixed-iteration IRLS Gauss-Newton on device.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from privacy_preserving_sfm_tpu.ops import cameras as cam_ops
from privacy_preserving_sfm_tpu.ops import e3q3, lie, linalg, lines as line_ops
from privacy_preserving_sfm_tpu.solvers import ransac

BIG = 1e30


def _vec_colmajor(R: jax.Array) -> jax.Array:
    """Column-major vec(R): r[3a+b] = R[b, a] (matches Eigen Map order)."""
    return jnp.swapaxes(R, -1, -2).reshape(R.shape[:-2] + (9,))


def _rotation_to_e3q3(Rcoeffs: jax.Array) -> jax.Array:
    """Homogeneous constraints Rcoeffs @ vec(R) = 0 -> 3Q3 coefficients.

    Cayley substitution R(c) (1 + |c|^2) expanded over the monomial basis;
    mirror of ``absolute_pose.cc:46-62``.
    """
    r = Rcoeffs  # (..., 3, 9)
    c0 = r[..., 0] - r[..., 4] - r[..., 8]
    c1 = 2 * (r[..., 1] + r[..., 3])
    c2 = 2 * (r[..., 2] + r[..., 6])
    c3 = r[..., 4] - r[..., 0] - r[..., 8]
    c4 = 2 * (r[..., 5] + r[..., 7])
    c5 = r[..., 8] - r[..., 4] - r[..., 0]
    c6 = 2 * (r[..., 5] - r[..., 7])
    c7 = 2 * (r[..., 6] - r[..., 2])
    c8 = 2 * (r[..., 1] - r[..., 3])
    c9 = r[..., 0] + r[..., 4] + r[..., 8]
    return jnp.stack([c0, c1, c2, c3, c4, c5, c6, c7, c8, c9], axis=-1)


def p6l_minimal(lines: jax.Array, points: jax.Array,
                key: Optional[jax.Array] = None):
    """Solve the P6L minimal problem, batched.

    Args:
      lines:  (..., 6, 3) normalized 2D lines (||l[:2]|| = 1).
      points: (..., 6, 3) 3D points.
      key: PRNG key for degeneracy-breaking random combinations.

    Returns:
      poses: (..., 8, 3, 4) candidate [R | t].
      valid: (..., 8) bool.
    """
    dtype = lines.dtype
    # kron(X^T, l^T) rows: tt[i, 3a+b] = X_a * l_b.
    def kron_rows(ls, Xs):  # (..., 3, 3) each -> (..., 3, 9)
        return (Xs[..., :, :, None] * ls[..., :, None, :]).reshape(
            ls.shape[:-2] + (3, 9))

    l_t = lines[..., :3, :]   # first three correspondences eliminate t
    l_r = lines[..., 3:, :]
    tt = kron_rows(l_t, points[..., :3, :])
    Rcoeffs = kron_rows(l_r, points[..., 3:, :])

    # B = [l_0 l_1 l_2] (columns); singular-guard via a random combination of
    # the other three constraints (absolute_pose.cc:125-134), branch-free.
    B = jnp.swapaxes(l_t, -1, -2)  # (..., 3, 3) columns are lines
    detB = jnp.abs(linalg.det3(B))
    if key is not None:
        Amix = jax.random.normal(key, (3, 3), dtype=dtype)
    else:
        # Fixed full-rank mixing matrix (deterministic fallback).
        Amix = jnp.asarray(
            [[0.59, -1.31, 0.24], [1.07, 0.45, -0.86], [-0.33, 0.92, 1.18]],
            dtype=dtype)
    degen = (detB < 1e-10)[..., None, None]
    tt = jnp.where(degen, tt + jnp.einsum("ij,...jk->...ik", Amix, Rcoeffs), tt)
    B = jnp.where(
        degen,
        B + jnp.einsum("...ij,kj->...ik", jnp.swapaxes(l_r, -1, -2), Amix),
        B)

    # t = -(B^T)^{-1} tt vec(R): store tt <- (B^T)^{-1} tt.
    Bt_inv = linalg.inv3(jnp.swapaxes(B, -1, -2))
    tt = jnp.einsum("...ij,...jk->...ik", Bt_inv, tt)
    # Substitute t into the remaining three constraints:
    # row i: Rcoeffs_i - l_i^T tt  (l_r rows ARE the line transposes).
    Rcoeffs = Rcoeffs - jnp.einsum("...ij,...jk->...ik", l_r, tt)

    coeffs = _rotation_to_e3q3(Rcoeffs)
    sols, valid = e3q3.solve_e3q3(coeffs, key=None)

    R = lie.cayley_to_rotmat(sols)  # (..., 8, 3, 3)
    t = -jnp.einsum("...ij,...rj->...ri", tt, _vec_colmajor(R))
    poses = jnp.concatenate([R, t[..., None]], axis=-1)
    valid = valid & jnp.all(jnp.isfinite(poses.reshape(poses.shape[:-2] + (12,))),
                            axis=-1)
    return poses, valid


def p6l_residuals(poses: jax.Array, lines: jax.Array,
                  points: jax.Array) -> jax.Array:
    """Squared normalized point-to-line residual with cheirality gating.

    Mirror of ``ComputeSquaredLineReprojectionError``
    (``estimators/utils.cc:40-89``): res = (l . (P X / z))^2, BIG behind
    camera.  poses (..., 3, 4); lines/points broadcast on (..., N, 3).
    """
    xyz = jnp.einsum("...ij,...nj->...ni", poses[..., :3], points) + poses[..., None, :, 3]
    z = xyz[..., 2]
    num = jnp.sum(lines[..., :2] * xyz[..., :2], axis=-1) + lines[..., 2] * z
    z_safe = jnp.where(jnp.abs(z) < 1e-30, 1e-30, z)
    r = num / z_safe
    r2 = r * r
    return jnp.where(z > jnp.finfo(poses.dtype).eps, r2, BIG)


class PoseResult(NamedTuple):
    qvec: jax.Array
    tvec: jax.Array
    num_inliers: jax.Array
    inlier_mask: jax.Array
    success: jax.Array  # bool scalar


def estimate_absolute_pose_from_lines(
    key: jax.Array,
    lines: jax.Array,
    aligned: jax.Array,
    points3d: jax.Array,
    valid: jax.Array,
    max_error_normalized,
    num_hypotheses: int = 4096,
) -> PoseResult:
    """RANSAC P6L pose (device-resident, fixed-shape).

    Args:
      key: PRNG key.
      lines: (N, 3) normalized lines.  aligned: (N,) bool.
      points3d: (N, 3) corresponding 3D points.
      valid: (N,) bool mask (padding / missing correspondences).
      max_error_normalized: inlier threshold in the normalized image plane
        (caller converts pixels via ``cameras.image_to_world_threshold``,
        as ``incremental_mapper.cc:673-674`` does).
      num_hypotheses: hypothesis batch size (replaces the reference's
        adaptive 100..10000 sequential trials).

    Behavioral guards from the reference:
      * all-aligned minimal samples produce no model
        (``absolute_pose.cc:95-97``),
      * a best model whose inliers are >90% aligned is rejected
        (``pose.cc:69-83``).
    """
    n = lines.shape[0]
    k_sample, k_solve = jax.random.split(key)
    idx = ransac.draw_samples(k_sample, n, valid, 6, num_hypotheses)  # (B, 6)

    s_lines = lines[idx]        # (B, 6, 3)
    s_points = points3d[idx]    # (B, 6, 3)
    s_aligned = aligned[idx]    # (B, 6)
    sample_ok = ~jnp.all(s_aligned, axis=-1)  # reject all-aligned samples

    poses, pvalid = p6l_minimal(s_lines, s_points, key=k_solve)  # (B,8,3,4)
    pvalid = pvalid & sample_ok[:, None]

    thresh = jnp.asarray(max_error_normalized, lines.dtype) ** 2
    res = p6l_residuals(poses, lines[None, None], points3d[None, None])  # (B,8,N)
    res = jnp.where(pvalid[..., None], res, BIG)
    score, num, inl = ransac.inlier_score(res, thresh, valid[None, None])
    best = ransac.select_best(poses, score, num, inl)

    # Aligned-degeneracy guard.
    num_aligned = jnp.sum(best.inlier_mask & aligned)
    success = (best.num_inliers > 0) & (
        num_aligned <= 0.9 * best.num_inliers)

    R = best.model[..., :3]
    qvec = lie.rotmat_to_quat(R)
    tvec = best.model[..., 3]
    success = success & jnp.all(jnp.isfinite(qvec)) & jnp.all(jnp.isfinite(tvec))
    return PoseResult(qvec=qvec, tvec=tvec, num_inliers=best.num_inliers,
                      inlier_mask=best.inlier_mask, success=success)


# ---------------------------------------------------------------------------
# Pose refinement (reference pose.cc:96-213): IRLS Gauss-Newton on the
# pixel-space line cost with Cauchy loss, points and camera fixed.
# ---------------------------------------------------------------------------

REFINE_ITERS = 20


def refine_absolute_pose_from_lines(
    qvec: jax.Array,
    tvec: jax.Array,
    lines: jax.Array,
    points3d: jax.Array,
    weights_mask: jax.Array,
    camera_model: str,
    camera_params: jax.Array,
    loss_scale: float = 1.0,
    iters: int = REFINE_ITERS,
):
    """Refine (qvec, tvec) by damped IRLS Gauss-Newton.

    Residual = 2-vector pixel line cost (``cost_functions.h:62-100``),
    robustified with Cauchy weights of scale ``loss_scale``; observations
    with ``weights_mask == 0`` are excluded (the inlier mask).  The update
    is computed in the 6-dof tangent space (rotation vector + translation)
    which replaces Ceres' quaternion local parameterization.
    """
    dtype = qvec.dtype
    w_mask = weights_mask.astype(dtype)

    def quat_delta(dq):
        # Smooth at dq = 0 (unlike axis-angle), so jacfwd is well-defined:
        # q_delta = (1, dq/2) / sqrt(1 + |dq/2|^2).
        half = dq / 2.0
        w = jnp.ones((1,), dtype)
        q = jnp.concatenate([w, half])
        return q / jnp.sqrt(1.0 + jnp.sum(half * half))

    def body(_, carry):
        q, t = carry

        def res_qt(params):
            dq, dt = params[:3], params[3:]
            qq = lie.quat_multiply(q, quat_delta(dq))
            return line_ops.line_ba_residual(
                lines, points3d, qq, t + dt, camera_model, camera_params)

        zero = jnp.zeros((6,), dtype)
        r = res_qt(zero)  # (N, 2)
        J = jax.jacfwd(res_qt)(zero)  # (N, 2, 6)

        # Cauchy IRLS weights on the squared norm of the 2-residual.
        sq = jnp.sum(r * r, axis=-1)
        w = w_mask / (1.0 + sq / (loss_scale ** 2))
        Jw = J * w[:, None, None]
        JtJ = jnp.einsum("nri,nrj->ij", Jw, J)
        Jtr = jnp.einsum("nri,nr->i", Jw, r)
        lam = 1e-6 * jnp.trace(JtJ)
        step = _solve6(JtJ + lam * jnp.eye(6, dtype=dtype), Jtr)
        step = jnp.where(jnp.isfinite(step), step, 0.0)

        q_new = lie.quat_normalize(lie.quat_multiply(q, quat_delta(-step[:3])))
        return q_new, t - step[3:]

    q, t = jax.lax.fori_loop(0, iters, body, (qvec, tvec))
    return q, t


def _solve6(A: jax.Array, b: jax.Array) -> jax.Array:
    """6x6 SPD solve by 3x3 block elimination (closed-form kernels only)."""
    A11, A12 = A[:3, :3], A[:3, 3:]
    A21, A22 = A[3:, :3], A[3:, 3:]
    A11i = linalg.inv3(A11)
    S = A22 - A21 @ A11i @ A12  # Schur complement
    b1, b2 = b[:3], b[3:]
    rhs2 = b2 - A21 @ (A11i @ b1)
    x2 = linalg.solve3(S, rhs2)
    x1 = A11i @ (b1 - A12 @ x2)
    return jnp.concatenate([x1, x2])
