"""Four-view reconstruction bootstrap from privacy-preserving lines.

Orchestrates the two LO-MSAC stages of the reference initializer
(``src/init/initializer.cc:57-215``) as fixed-batch device kernels:

  1. gravity pre-rotation: aligned lines -> 2D bearings in the horizontal
     plane (``initializer.cc:63-99``),
  2. LO-MSAC over ``FourView2dEstimator`` minimal samples (16 models per
     5-point sample), with local optimization = 2D bundle + points polish
     (RansacLib ``final_least_squares_``; ``initializer.cc:114-124``),
  3. mean-minimum-triangulation-angle gate over the first three cameras
     (``initializer.cc:154-186``),
  4. camera lift to 3D with unknown vertical offsets
     (``initializer.cc:45-55``),
  5. LO-MSAC over ``PlanarOffsetEstimator`` (3 random-line sample solves the
     3 offsets linearly; ``initializer.cc:236-333``).

All sampling is batched (B hypotheses scored in parallel, chunked to bound
memory); the adaptive sequential loop of RansacLib is replaced by a fixed
hypothesis budget matching its 1000-iteration minimum.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from privacy_preserving_sfm_tpu.init import sfm2d
from privacy_preserving_sfm_tpu.ops import lie, linalg
from privacy_preserving_sfm_tpu.ops import triangulation as tri_ops
from privacy_preserving_sfm_tpu.solvers import ransac

BIG = 1e5  # planar-offset cheirality sentinel (initializer.cc:320)


class InitOptions(NamedTuple):
    """``init::InitOptions`` (``initializer.h:48-57``)."""

    min_tri_angle_deg: float = 0.1  # mean-min-tri-angle gate, degrees
    min_num_inliers: int = 6
    max_error: float = 0.005  # normalized-plane threshold, both stages
    num_samples_fourview: int = 1024  # >= RansacLib's 1000 min iterations
    num_samples_offset: int = 1024
    chunk: int = 128


class InitResult(NamedTuple):
    poses: jax.Array  # (4, 3, 4) world->camera [R | t]
    inlier_ratio: jax.Array
    num_inliers: jax.Array
    success: jax.Array
    cams2d: jax.Array  # (4, 2, 3) the 2D model (debug / tests)
    points2d: jax.Array  # (N, 2)


def gravity_rotations(gravity: jax.Array) -> jax.Array:
    """Per-image rotation taking the gravity direction to +y. (V,3)->(V,3,3).

    ``Rg = FromTwoVectors(g, (0,1,0))`` (``initializer.cc:73``).
    """
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], gravity.dtype),
                          gravity.shape)
    q = lie.quat_from_two_vectors(gravity, up)
    return lie.quat_to_rotmat(q)


def aligned_lines_to_bearings(lines: jax.Array, Rg: jax.Array) -> jax.Array:
    """Pre-rotated aligned lines -> 2D unit bearings.

    lines: (..., 3) aligned lines (camera frame), Rg: (..., 3, 3).
    ``l' = Rg l`` has l'_y ~ 0; the bearing is (l'_z, -l'_x), sign-fixed to
    the upper half circle and normalized (``initializer.cc:82-94``).
    """
    lp = jnp.einsum("...ij,...j->...i", Rg, lines)
    x = jnp.stack([lp[..., 2], -lp[..., 0]], axis=-1)
    x = jnp.where((x[..., 1:2] < 0), -x, x)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)


def lift_camera_2d(cams2d: jax.Array) -> jax.Array:
    """2D pose (..., 2, 3) -> 3D pose (..., 3, 4) with t_y = 0.

    The 2D x/y axes map to 3D x/z; y (vertical) gets the identity row
    (``initializer.cc:45-55``).
    """
    shape = cams2d.shape[:-2]
    P = jnp.zeros(shape + (3, 4), cams2d.dtype)
    P = P.at[..., 0, 0].set(cams2d[..., 0, 0])
    P = P.at[..., 0, 2].set(cams2d[..., 0, 1])
    P = P.at[..., 2, 0].set(cams2d[..., 1, 0])
    P = P.at[..., 2, 2].set(cams2d[..., 1, 1])
    P = P.at[..., 1, 1].set(1.0)
    P = P.at[..., 0, 3].set(cams2d[..., 0, 2])
    P = P.at[..., 2, 3].set(cams2d[..., 1, 2])
    return P


# ---------------------------------------------------------------------------
# Stage 1: four-view 2D LO-MSAC
# ---------------------------------------------------------------------------


def _score_models(cams, x_all, thresh, valid_pts, valid_models):
    """MSAC-score 4-view 2D models against all points.

    cams (..., 4, 2, 3); x_all (4, N, 2).  Triangulates every point from
    views 1-3 per model, then max-over-views ratio error.
    Returns (score, num_inliers, inlier_mask, X).
    """
    x123 = jnp.moveaxis(x_all[:3], 0, -2)  # (N, 3, 2)
    X = sfm2d.triangulate2d(cams[..., None, :3, :, :], x123)  # (..., N, 2)
    xv = jnp.moveaxis(x_all, 0, -2)  # (N, 4, 2)
    err = sfm2d.reproj_error_2d(cams[..., None, :, :, :], X, xv)  # (..., N)
    err = jnp.where(valid_models[..., None], err, sfm2d.BIG2D)
    score, num, inl = ransac.msac_score(err, thresh, valid_pts)
    return score, num, inl, X


def estimate_fourview_2d(
    key: jax.Array,
    x_all: jax.Array,
    valid: jax.Array,
    max_error: float,
    num_samples: int = 1024,
    chunk: int = 128,
):
    """LO-MSAC over 4-view 2D minimal samples.

    x_all: (4, N, 2) unit bearings per view (corresponding across views);
    valid: (N,) mask.  Returns (cams (4,2,3), X (N,2), score, num_inliers,
    inlier_mask).
    """
    n = x_all.shape[1]
    dtype = x_all.dtype
    k_s, k_f = jax.random.split(key)
    idx = ransac.draw_samples(k_s, n, valid, 5, num_samples)  # (B, 5)
    fact_keys = jax.random.split(k_f, num_samples)

    def eval_chunk(args):
        idx_c, keys_c = args  # (C, 5), (C, 2)

        def one(ic, kc):
            s1, s2, s3, s4 = (x_all[0][ic], x_all[1][ic], x_all[2][ic],
                              x_all[3][ic])
            cams, _, valid_m = sfm2d.fourview_minimal_models(s1, s2, s3, s4, kc)
            return cams, valid_m  # (16, 4, 2, 3), (16,)

        cams, valid_m = jax.vmap(one)(idx_c, keys_c)  # (C, 16, ...)
        score, num, inl, X = _score_models(cams, x_all, max_error, valid,
                                           valid_m)
        # Best within chunk.
        flat = score.reshape(-1)
        b = jnp.argmax(flat)
        C16 = flat.shape[0]
        return (flat[b],
                cams.reshape((C16, 4, 2, 3))[b],
                num.reshape(-1)[b],
                inl.reshape((C16, -1))[b])

    n_chunks = max(1, num_samples // chunk)
    idx_chunks = idx[:n_chunks * chunk].reshape(n_chunks, chunk, 5)
    key_chunks = fact_keys[:n_chunks * chunk].reshape(n_chunks, chunk, 2)
    scores, cams_b, nums, inls = jax.lax.map(
        eval_chunk, (idx_chunks, key_chunks))
    best = jnp.argmax(scores)
    best_cams = cams_b[best]
    best_score = scores[best]
    best_inl = inls[best]
    best_num = nums[best]

    # Local optimization + final least squares (RansacLib LO-MSAC with
    # final_least_squares_=true): joint 2D bundle on inliers, points polish
    # on all, keep if the MSAC score improves.  Two rounds.
    def lo_round(carry, _):
        cams, score, num, inl = carry
        x123 = jnp.moveaxis(x_all[:3], 0, -2)
        X0 = sfm2d.triangulate2d(cams[None, :3], x123)
        w = (inl & valid).astype(dtype)
        cams_lo, _ = sfm2d.bundle_adjust_2d(cams, x_all, X0, w)
        score2, num2, inl2, _ = _score_models(
            cams_lo[None], x_all, max_error, valid,
            jnp.ones((1,), bool))
        better = score2[0] > score
        cams = jnp.where(better, cams_lo, cams)
        score = jnp.where(better, score2[0], score)
        num = jnp.where(better, num2[0], num)
        inl = jnp.where(better[None] if inl.ndim == 1 else better, inl2[0], inl)
        return (cams, score, num, inl), None

    (best_cams, best_score, best_num, best_inl), _ = jax.lax.scan(
        lo_round, (best_cams, best_score, best_num, best_inl), None, length=2)

    # Final triangulation of all points under the winning model.
    x123 = jnp.moveaxis(x_all[:3], 0, -2)
    X = sfm2d.triangulate2d(best_cams[None, :3], x123)
    X = sfm2d.optimize_points_2d(best_cams, x_all, X)
    return best_cams, X, best_score, best_num, best_inl


def mean_min_tri_angle_2d(cams: jax.Array, X: jax.Array,
                          weights: jax.Array) -> jax.Array:
    """Mean over points of the min pairwise tri angle among cams 0-2, degrees.

    (``initializer.cc:154-182``.)
    """
    centers = -jnp.einsum("vji,vj->vi", cams[:3, :, :2], cams[:3, :, 2])
    angs = []
    for i in range(3):
        for j in range(i + 1, 3):
            v1 = centers[i] - X  # (N, 2)
            v2 = centers[j] - X
            c = jnp.sum(v1 * v2, axis=-1) / jnp.maximum(
                jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1),
                1e-30)
            angs.append(jnp.arccos(jnp.clip(c, -1.0, 1.0)))
    min_ang = jnp.min(jnp.stack(angs, -1), axis=-1)
    w = weights.astype(X.dtype)
    mean = jnp.sum(min_ang * w) / jnp.maximum(jnp.sum(w), 1.0)
    return mean * 180.0 / jnp.pi


# ---------------------------------------------------------------------------
# Stage 2: planar offsets from random lines
# ---------------------------------------------------------------------------


def planar_offset_solve(poses: jax.Array, Rg: jax.Array,
                        lines_r: jax.Array, sample_mask: jax.Array):
    """Solve the 3 vertical offsets from sampled random-line tracks.

    poses: (4, 3, 4) lifted gravity-aligned cameras (t_y unknown, set 0).
    Rg: (4, 3, 3).  lines_r: (..., 4, S, 3) sampled random lines per view
    (original camera frame).  sample_mask: (..., S).

    Per point i and view j in {1,2,3}:  lg = Rg_j l_j;  the three
    constraints from views 1-3 express X_i linearly in the offsets tau, and
    the view-0 constraint gives one equation per point
    (``initializer.cc:236-258``).  Returns cams (..., 4, 3, 4) in the
    original frame.
    """
    dtype = poses.dtype
    # lg for views 1..3: (..., 3v, S, 3)
    lg = jnp.einsum("vij,...vsj->...vsi", Rg[1:], lines_r[..., 1:, :, :])
    R = poses[1:, :, :3]  # (3, 3, 3)
    A0 = jnp.einsum("...vsi,vij->...svj", lg, R)  # (..., S, 3v(row), 3)
    B0_diag = lg[..., 1]  # (..., 3v, S)
    B0_last = (lg[..., 0] * poses[1:, 0, 3][:, None]
               + lg[..., 2] * poses[1:, 2, 3][:, None])  # (..., 3v, S)
    # Assemble B0 (..., S, 3, 4): diag(tau coeffs) | last col.
    S = lines_r.shape[-2]
    B0 = jnp.zeros(B0_diag.shape[:-2] + (S, 3, 4), dtype)
    for j in range(3):
        B0 = B0.at[..., j, j].set(jnp.moveaxis(B0_diag, -2, -1)[..., j])
        B0 = B0.at[..., j, 3].set(jnp.moveaxis(B0_last, -2, -1)[..., j])
    A0_inv = linalg.inv3(A0)
    B0p = jnp.einsum("ij,...sjk->...sik", Rg[0].T,
                     jnp.einsum("...sij,...sjk->...sik", A0_inv, B0))
    l0 = lines_r[..., 0, :, :]  # (..., S, 3)
    Arow = jnp.einsum("...si,...sij->...sj", l0, B0p[..., :3])  # (..., S, 3)
    brow = -jnp.einsum("...si,...si->...s", l0, B0p[..., 3])
    m = sample_mask.astype(dtype)
    tau = linalg.lstsq_normal3(Arow * m[..., None], brow * m,
                               reg_scale=1e-14, refine=1)  # (..., 3)

    cams_al = jnp.broadcast_to(poses, tau.shape[:-1] + (4, 3, 4))
    cams_al = cams_al.at[..., 1:, 1, 3].set(tau)
    cams = jnp.einsum("vji,...vjk->...vik", Rg, cams_al)  # Rg^T compose
    return cams


def planar_offset_residuals(cams: jax.Array, lines_r: jax.Array,
                            X: jax.Array) -> jax.Array:
    """Max-over-views |l . hnorm(P X)| / ||l[:2]|| with cheirality gating.

    cams (..., 4, 3, 4); lines_r (..., 4, N, 3); X (..., N, 3)
    (``initializer.cc:311-333``).
    """
    xyz = (jnp.einsum("...vij,...nj->...vni", cams[..., :3], X)
           + cams[..., None, :, 3])
    z = xyz[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-30, 1e-30, z)
    p = xyz / z_safe[..., None]
    num = jnp.abs(jnp.sum(lines_r * p, axis=-1))
    den = jnp.maximum(jnp.linalg.norm(lines_r[..., :2], axis=-1), 1e-30)
    err = num / den  # (..., 4, N): view axis is -2
    bad = jnp.any(z < 0, axis=-2)
    return jnp.where(bad, BIG, jnp.max(err, axis=-2))


def estimate_planar_offsets(
    key: jax.Array,
    poses: jax.Array,
    Rg: jax.Array,
    lines_r: jax.Array,
    valid: jax.Array,
    max_error: float,
    num_samples: int = 1024,
):
    """LO-MSAC over 3-track offset samples.  lines_r: (4, M, 3)."""
    m = lines_r.shape[1]
    idx = ransac.draw_samples(key, m, valid, 3, num_samples)  # (B, 3)
    s_lines = jnp.moveaxis(lines_r[:, idx], 0, 1)  # (B, 4, 3, 3)
    ones = jnp.ones(idx.shape, bool)
    cams = planar_offset_solve(poses, Rg, s_lines, ones)  # (B, 4, 3, 4)

    X = _triangulate_tracks(cams, lines_r)  # (B, M, 3)
    err = planar_offset_residuals(cams, lines_r[None], X)  # (B, M)
    score, num, inl = ransac.msac_score(err, max_error, valid[None])
    best = ransac.select_best(cams, score, num, inl)

    # Iterated non-minimal refits on the inlier set (the LO loop of
    # RansacLib's LO-MSAC; the reference's extra LeastSquares BA is
    # disabled, initializer.cc:450-451).
    def lo_round(carry, _):
        cams_c, score_c, num_c, inl_c = carry
        cams_nm = planar_offset_solve(poses, Rg, lines_r[None],
                                      (inl_c & valid)[None])[0]
        X_nm = _triangulate_tracks(cams_nm[None], lines_r)[0]
        err_nm = planar_offset_residuals(cams_nm, lines_r, X_nm)
        score_nm, num_nm, inl_nm = ransac.msac_score(err_nm, max_error, valid)
        better = score_nm > score_c
        return (jnp.where(better, cams_nm, cams_c),
                jnp.where(better, score_nm, score_c),
                jnp.where(better, num_nm, num_c),
                jnp.where(better, inl_nm, inl_c)), None

    (cams_f, _, num_f, inl_f), _ = jax.lax.scan(
        lo_round, (best.model, best.score, best.num_inliers,
                   best.inlier_mask), None, length=3)
    return cams_f, num_f, inl_f


def _triangulate_tracks(cams: jax.Array, lines_r: jax.Array) -> jax.Array:
    """4-view linear triangulation of all tracks.  cams (..., 4, 3, 4)."""
    lv = jnp.moveaxis(lines_r, -3, -2)  # (..., M, 4, 3) or (M, 4, 3)
    return tri_ops.triangulate_linear(cams[..., None, :, :, :], lv)


# ---------------------------------------------------------------------------
# Full bootstrap
# ---------------------------------------------------------------------------


def initialize_reconstruction(
    key: jax.Array,
    aligned_lines: jax.Array,
    aligned_valid: jax.Array,
    random_lines: jax.Array,
    random_valid: jax.Array,
    gravity: jax.Array,
    options: InitOptions = InitOptions(),
) -> InitResult:
    """Bootstrap 4 camera poses from aligned + random line tracks.

    Args:
      aligned_lines: (4, N, 3) gravity-aligned line tracks (camera frame).
      aligned_valid: (N,) track mask.
      random_lines: (4, M, 3) random line tracks.
      random_valid: (M,) track mask.
      gravity: (4, 3) per-image gravity directions (camera frame).

    Mirrors ``init::initialize_reconstruction`` (``initializer.cc:57-215``)
    with fixed-shape batched RANSAC stages.
    """
    k1, k2 = jax.random.split(key)
    Rg = gravity_rotations(gravity)
    x_all = aligned_lines_to_bearings(aligned_lines, Rg[:, None])  # (4, N, 2)

    cams2d, X2d, score2d, num2d, inl2d = estimate_fourview_2d(
        k1, x_all, aligned_valid, options.max_error,
        options.num_samples_fourview, options.chunk)

    mean_angle = mean_min_tri_angle_2d(cams2d, X2d, inl2d & aligned_valid)
    stage1_ok = ((num2d >= options.min_num_inliers)
                 & (mean_angle >= options.min_tri_angle_deg))

    poses_lifted = lift_camera_2d(cams2d)  # (4, 3, 4), t_y = 0

    cams, num_off, inl_off = estimate_planar_offsets(
        k2, poses_lifted, Rg, random_lines, random_valid,
        options.max_error, options.num_samples_offset)

    m_valid = jnp.maximum(jnp.sum(random_valid), 1)
    inlier_ratio = num_off / m_valid
    success = (stage1_ok & (num_off >= options.min_num_inliers))

    return InitResult(poses=cams, inlier_ratio=inlier_ratio,
                      num_inliers=num_off, success=success,
                      cams2d=cams2d, points2d=X2d)
