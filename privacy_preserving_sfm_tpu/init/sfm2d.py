"""2D structure-from-motion solvers for the 4-view initializer (batched).

Gravity-aligned lines, pre-rotated so gravity is the +y axis, become 2D
bearing observations in the horizontal plane; 2D cameras are 2x3 matrices
``[R(theta) | t]`` acting on homogeneous 2D points.  This module re-derives
the reference's solvers (``src/init/sfm2d.cc``) as batched JAX kernels:

  * ``trifocal_minimal``: 2D trifocal tensor (8 entries, 6-vector
    parametrization) from >= 5 triplets via a Gram null vector
    (``sfm2d.cc:363-381``),
  * ``factorize_trifocal``: tensor -> two camera-triple factorizations via a
    quadratic in the first camera row + a 7x6 null vector, wrapped in a
    random projective coordinate change for stability (``sfm2d.cc:227-298``),
  * ``metric_upgrade``: 3x3 H making P2/P3 calibrated (``sfm2d.cc:178-191``),
  * ``triangulate2d``: per-point linear 2-unknown solve (``sfm2d.cc:194-213``),
  * ``abs_pose_2d``: 2D absolute pose with translation elimination
    (``sfm2d.cc:321-361``),
  * ``bundle_adjust_2d``: Schur-complement Gauss-Newton on the ratio
    residual ``p0/p1 - x0/x1`` with the reference's gauge (cam0 fixed,
    rotations on the unit circle, ||t1|| = 1) (``sfm2d.cc:118-175``),
  * ``optimize_points_2d``: points-only polish, cameras fixed
    (``sfm2d.cc:75-116``).

Cheirality convention: the 2D "depth" axis is the *second* coordinate
(``sfm2d.cc:308``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from privacy_preserving_sfm_tpu.ops import linalg

BIG2D = 1e6  # cheirality sentinel of EvaluateModelOnPoint (sfm2d.cc:309)


def rot2(theta: jax.Array) -> jax.Array:
    c, s = jnp.cos(theta), jnp.sin(theta)
    row = jnp.stack([c, -s, s, c], axis=-1)
    return row.reshape(theta.shape + (2, 2))


def cam2_apply(cams: jax.Array, X: jax.Array) -> jax.Array:
    """(..., 2, 3) 2D cameras applied to (..., 2) points -> (..., 2)."""
    return (jnp.einsum("...ij,...j->...i", cams[..., :2], X) + cams[..., 2])


def trifocal_minimal(x1: jax.Array, x2: jax.Array, x3: jax.Array) -> jax.Array:
    """2D trifocal tensor from sampled triplets.

    x1/x2/x3: (..., S, 2) unit bearings.  Returns (..., 8) tensor with
    linear index a + 2b + 4c over T_{abc}; constraint
    sum_abc T_{abc} x1_a x2_b x3_c = 0.  The 6-dof parametrization and the
    recovery T0 = t1+t3+t4, T1 = -t2-t0+t5 mirror ``sfm2d.cc:363-381``.
    """
    a1, a2 = x1[..., 0], x1[..., 1]
    b1, b2 = x2[..., 0], x2[..., 1]
    c1, c2 = x3[..., 0], x3[..., 1]
    rows = jnp.stack(
        [
            a1 * b2 * c1 - a2 * b1 * c1,
            a1 * b1 * c1 + a2 * b2 * c1,
            a1 * b1 * c2 - a2 * b1 * c1,
            a1 * b1 * c1 + a2 * b1 * c2,
            a1 * b1 * c1 + a1 * b2 * c2,
            a2 * b1 * c1 + a2 * b2 * c2,
        ],
        axis=-1,
    )  # (..., S, 6)
    t = linalg.gram_null_vector(rows)  # (..., 6)
    T0 = t[..., 1] + t[..., 3] + t[..., 4]
    T1 = -t[..., 2] - t[..., 0] + t[..., 5]
    return jnp.concatenate([T0[..., None], T1[..., None], t], axis=-1)


def trifocal_coord_change(T: jax.Array, A1, A2, A3) -> jax.Array:
    """T'_{a'b'c'} = sum_abc A1[a,a'] A2[b,b'] A3[c,c'] T_{abc}.

    (``sfm2d.cc:215-224``, programmatic instead of hand-expanded.)
    """
    T3 = T.reshape(T.shape[:-1] + (2, 2, 2))  # [c][b][a]
    out = jnp.einsum("cC,bB,aA,...cba->...CBA", A3, A2, A1, T3)
    return out.reshape(T.shape[:-1] + (8,))


def factorize_trifocal(T: jax.Array, key: jax.Array):
    """Factorize tensors into two projective camera triples.

    T: (..., 8).  Returns (P1, P2, P3) each (..., 2, 2, 3) — axis -3 indexes
    the two quadratic roots — plus a validity mask (..., 2) (complex roots
    -> invalid, mirroring the early return at ``sfm2d.cc:244-246``).
    """
    dtype = T.dtype
    # Random projective change of image coordinates (degeneracy guard,
    # sfm2d.cc:227-235); one draw per call is what the reference does too.
    kA = jax.random.split(key, 3)
    A1 = jax.random.normal(kA[0], (2, 2), dtype)
    A2 = jax.random.normal(kA[1], (2, 2), dtype)
    A3 = jax.random.normal(kA[2], (2, 2), dtype)
    AT = trifocal_coord_change(T, A1, A2, A3)

    t = [AT[..., i] for i in range(8)]
    alpha = t[2] * t[7] - t[3] * t[6]
    beta = t[1] * t[6] + t[3] * t[4] - t[0] * t[7] - t[2] * t[5]
    gamma = t[0] * t[5] - t[1] * t[4]

    disc = beta * beta - 4.0 * alpha * gamma
    valid_fact = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # Sign choice avoiding cancellation (sfm2d.cc:248-251).
    denom = jnp.where(beta > 0, -beta - sq, -beta + sq)
    denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    r0 = 2.0 * gamma / denom
    alpha_r0 = alpha * r0
    alpha_r0 = jnp.where(jnp.abs(alpha_r0) < 1e-30, 1e-30, alpha_r0)
    r1 = gamma / alpha_r0
    aa1 = jnp.stack([r0, r1], axis=-1)  # (..., 2)

    # Per root: normalize (a1, 1), derive second camera row, 7x6 null space.
    s = jnp.sqrt(1.0 + aa1 * aa1)
    a1 = aa1 / s
    a2 = 1.0 / s
    ATb = AT[..., None, :]  # broadcast over the root axis
    tb = [ATb[..., i] for i in range(8)]
    rho_den = tb[2] * a1 - tb[0] * a2
    rho_den = jnp.where(jnp.abs(rho_den) < 1e-30, 1e-30, rho_den)
    rho = -(tb[1] * a2 - tb[3] * a1) / rho_den
    b1 = rho * a1
    b2 = rho * a2
    c1 = -a2
    c2 = a1

    z = jnp.zeros_like(a1)
    G = jnp.stack([
        jnp.stack([z, tb[7] * c2, -tb[0] * c1, z, tb[0] * b1, -tb[7] * a2], -1),
        jnp.stack([z, z, -tb[1] * c1, tb[7] * c2, tb[1] * b1, -tb[7] * b2], -1),
        jnp.stack([z, -tb[7] * c1, -tb[2] * c1, z, tb[2] * b1, tb[7] * a1], -1),
        jnp.stack([z, z, -tb[3] * c1, -tb[7] * c1, tb[3] * b1, tb[7] * b1], -1),
        jnp.stack([-tb[7] * c2, z, -tb[4] * c1, z, tb[7] * a2 + tb[4] * b1, z], -1),
        jnp.stack([z, z, -tb[5] * c1 - tb[7] * c2, z, tb[7] * b2 + tb[5] * b1, z], -1),
        jnp.stack([tb[7] * c1, z, -tb[6] * c1, z, -tb[7] * a1 + tb[6] * b1, z], -1),
    ], axis=-2)  # (..., 2, 7, 6)
    d = linalg.gram_null_vector(G)  # (..., 2, 6)

    eye23 = jnp.zeros(a1.shape + (2, 3), dtype).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    P1 = eye23
    P2 = jnp.stack([jnp.stack([a1, b1, c1], -1), jnp.stack([a2, b2, c2], -1)], -2)
    P3 = jnp.stack([jnp.stack([d[..., 0], d[..., 2], d[..., 4]], -1),
                    jnp.stack([d[..., 1], d[..., 3], d[..., 5]], -1)], -2)

    # Revert the coordinate change (sfm2d.cc:286-295): P_i <- A_i P_i, then
    # right-multiply the rotation block by A1^{-1} to restore P1 = [I | 0].
    A1inv = jnp.linalg.inv(A1) if False else _inv2(A1)
    P2 = jnp.einsum("ij,...jk->...ik", A2, P2)
    P3 = jnp.einsum("ij,...jk->...ik", A3, P3)
    P2 = P2.at[..., :2].set(jnp.einsum("...ij,jk->...ik", P2[..., :2], A1inv))
    P3 = P3.at[..., :2].set(jnp.einsum("...ij,jk->...ik", P3[..., :2], A1inv))

    valid = jnp.broadcast_to(valid_fact[..., None], aa1.shape)
    return P1, P2, P3, valid


def _inv2(A):
    det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    inv = jnp.stack([A[..., 1, 1], -A[..., 0, 1], -A[..., 1, 0], A[..., 0, 0]],
                    axis=-1).reshape(A.shape)
    return inv / det[..., None, None]


def metric_upgrade(P2: jax.Array, P3: jax.Array) -> jax.Array:
    """3x3 H (identity + last-row perturbation) making P2, P3 calibrated.

    Least-squares of 4 equations in 2 unknowns (``sfm2d.cc:178-191``).
    """
    A = jnp.stack([
        jnp.stack([P2[..., 0, 2], -P2[..., 1, 2]], -1),
        jnp.stack([P2[..., 1, 2], P2[..., 0, 2]], -1),
        jnp.stack([P3[..., 0, 2], -P3[..., 1, 2]], -1),
        jnp.stack([P3[..., 1, 2], P3[..., 0, 2]], -1),
    ], axis=-2)  # (..., 4, 2)
    b = jnp.stack([
        P2[..., 1, 1] - P2[..., 0, 0],
        -P2[..., 0, 1] - P2[..., 1, 0],
        P3[..., 1, 1] - P3[..., 0, 0],
        -P3[..., 0, 1] - P3[..., 1, 0],
    ], axis=-1)  # (..., 4)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    Atb = jnp.einsum("...ni,...n->...i", A, b)
    x = linalg.solve2(AtA, Atb)
    H = jnp.zeros(x.shape[:-1] + (3, 3), P2.dtype)
    H = H.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(1.0)
    H = H.at[..., 2, 0].set(x[..., 0]).at[..., 2, 1].set(x[..., 1])
    return H


def triangulate2d(cams: jax.Array, x: jax.Array, mask=None) -> jax.Array:
    """Linear 2D triangulation from bearing observations.

    cams: (..., V, 2, 3), x: (..., V, 2) -> (..., 2).  Row per view:
    ``x0 * P[1,:2] - x1 * P[0,:2] | x1 * P[0,2] - x0 * P[1,2]``
    (``sfm2d.cc:194-213``), solved via 2x2 normal equations with optional
    view masking.
    """
    A = (x[..., 0:1] * cams[..., 1, :2] - x[..., 1:2] * cams[..., 0, :2])
    b = x[..., 1] * cams[..., 0, 2] - x[..., 0] * cams[..., 1, 2]
    if mask is not None:
        m = mask.astype(A.dtype)
        A = A * m[..., None]
        b = b * m
    AtA = jnp.einsum("...vi,...vj->...ij", A, A)
    Atb = jnp.einsum("...vi,...v->...i", A, b)
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)
    eye = jnp.eye(2, dtype=A.dtype)
    return linalg.solve2(AtA + (1e-14 * tr)[..., None, None] * eye, Atb)


def abs_pose_2d(x: jax.Array, X: jax.Array, mask=None) -> jax.Array:
    """2D absolute pose from bearings x and 2D points X.

    x/X: (..., S, 2).  Translation is eliminated against the rotation
    unknowns, the rotation comes from a 2-vector Gram null space, and the
    sign is fixed by cheirality of the first (valid) sample point
    (``sfm2d.cc:321-361``).  Returns (..., 2, 3).
    """
    x1, x2 = x[..., 0], x[..., 1]
    X1, X2 = X[..., 0], X[..., 1]
    A = jnp.stack([X1 * x2 - X2 * x1, -X1 * x1 - X2 * x2], axis=-1)
    B = jnp.stack([x2, -x1], axis=-1)
    if mask is not None:
        m = mask.astype(A.dtype)
        A = A * m[..., None]
        B = B * m[..., None]
    BtB = jnp.einsum("...si,...sj->...ij", B, B)
    BtA = jnp.einsum("...si,...sj->...ij", B, A)
    C = -jnp.einsum("...ij,...jk->...ik", _inv2(BtB), BtA)
    M = A + jnp.einsum("...si,...ij->...sj", B, C)
    ab = linalg.gram_null_vector(M)  # (..., 2), unit norm
    tvec = jnp.einsum("...ij,...j->...i", C, ab)
    P = jnp.stack([
        jnp.stack([ab[..., 0], -ab[..., 1], tvec[..., 0]], -1),
        jnp.stack([ab[..., 1], ab[..., 0], tvec[..., 1]], -1),
    ], axis=-2)
    # Cheirality sign fix on the first sample point.
    z1 = cam2_apply(P, X[..., 0, :])[..., 1]
    return jnp.where((z1 < 0)[..., None, None], -P, P)


def reproj_error_2d(cams: jax.Array, X: jax.Array, x: jax.Array) -> jax.Array:
    """Max-over-views hnormalized bearing error with cheirality gating.

    cams (..., V, 2, 3), X (..., 2), x (..., V, 2) -> (...,).
    (``FourView2dEstimator::EvaluateModelOnPoint``, ``sfm2d.cc:302-319``.)
    """
    z = cam2_apply(cams, X[..., None, :])  # (..., V, 2)
    z1 = z[..., 1]
    z1_safe = jnp.where(jnp.abs(z1) < 1e-30, 1e-30, z1)
    x1_safe = jnp.where(jnp.abs(x[..., 1]) < 1e-30, 1e-30, x[..., 1])
    err = jnp.abs(z[..., 0] / z1_safe - x[..., 0] / x1_safe)
    err = jnp.max(err, axis=-1)
    bad = jnp.any(z1 < 0, axis=-1)
    return jnp.where(bad, BIG2D, err)


def cosine_error_2d(cams: jax.Array, X: jax.Array, x: jax.Array) -> jax.Array:
    """1 - <x, normalize(P X)> per view (``AbsolutePose2dEstimator``)."""
    z = cam2_apply(cams, X)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-30)
    return 1.0 - jnp.sum(x * z, axis=-1)


# ---------------------------------------------------------------------------
# 2D bundle adjustment (Gauss-Newton with Schur elimination of points)
# ---------------------------------------------------------------------------

BA2D_ITERS = 12


def _unpack_cams(theta: jax.Array, phi: jax.Array, t23: jax.Array,
                 cam0: jax.Array) -> jax.Array:
    """Camera params -> (4, 2, 3) cameras.  cam0 fixed; t1 = (cos, sin) phi."""
    R = rot2(theta)  # (3, 2, 2)
    t1 = jnp.stack([jnp.cos(phi), jnp.sin(phi)])
    ts = jnp.concatenate([t1[None], t23.reshape(2, 2)], axis=0)  # (3, 2)
    cams123 = jnp.concatenate([R, ts[..., None]], axis=-1)
    return jnp.concatenate([cam0[None], cams123], axis=0)


def bundle_adjust_2d(cams: jax.Array, x: jax.Array, X: jax.Array,
                     weights: jax.Array, iters: int = BA2D_ITERS):
    """Joint GN over cameras 1-3 and points with the reference gauge.

    Args:
      cams: (4, 2, 3) initial cameras (cam 0 held fixed).
      x: (4, N) observations as unit bearings (4, N, 2).
      X: (N, 2) initial points.
      weights: (N,) observation weights (0 masks a point out).

    Residual: p0/p1 - x0/x1 per (view, point) (``sfm2d.cc:55-73``), solved
    by Schur complement (2x2 point blocks eliminated into the 8-dof camera
    system, ``linalg.solve_gauss`` on the reduced 8x8).
    """
    dtype = cams.dtype
    n = X.shape[0]
    cam0 = cams[0]
    theta0 = jnp.arctan2(cams[1:, 1, 0], cams[1:, 0, 0])  # (3,)
    t1n = cams[1, :, 2] / jnp.maximum(jnp.linalg.norm(cams[1, :, 2]), 1e-30)
    phi0 = jnp.arctan2(t1n[1], t1n[0])
    # Rescale so ||t1|| = 1 (HomogeneousVectorParameterization gauge).
    scale = jnp.maximum(jnp.linalg.norm(cams[1, :, 2]), 1e-30)
    t23_0 = (cams[2:, :, 2] / scale).reshape(4)
    X0 = X / scale

    xr = x[..., 0] / jnp.where(jnp.abs(x[..., 1]) < 1e-30, 1e-30, x[..., 1])

    def residual_one(camvec, Xj, xrj):
        theta, phi, t23 = camvec[:3], camvec[3], camvec[4:]
        cams_all = _unpack_cams(theta, phi, t23, cam0)
        p = cam2_apply(cams_all, Xj[None, :])  # (4, 2)
        p1 = jnp.where(jnp.abs(p[..., 1]) < 1e-30, 1e-30, p[..., 1])
        return p[..., 0] / p1 - xrj  # (4,)

    def gn_step(carry, _):
        camvec, Xc = carry
        rfun = lambda cv, Xj, xrj: residual_one(cv, Xj, xrj)
        r = jax.vmap(rfun, in_axes=(None, 0, 1))(camvec, Xc, xr)  # (N, 4)
        Jc = jax.vmap(jax.jacfwd(rfun, argnums=0), in_axes=(None, 0, 1))(
            camvec, Xc, xr)  # (N, 4, 8)
        Jp = jax.vmap(jax.jacfwd(rfun, argnums=1), in_axes=(None, 0, 1))(
            camvec, Xc, xr)  # (N, 4, 2)
        w = weights[:, None]
        rw = r * w
        # Normal blocks.
        Hcc = jnp.einsum("nvi,nvj,n->ij", Jc, Jc, weights)
        Hcp = jnp.einsum("nvi,nvj,n->nij", Jc, Jp, weights)  # (N, 8, 2)
        Hpp = jnp.einsum("nvi,nvj,n->nij", Jp, Jp, weights)  # (N, 2, 2)
        gc = jnp.einsum("nvi,nv->i", Jc, rw)
        gp = jnp.einsum("nvi,nv->ni", Jp, rw)
        # Damped point blocks (masked points get identity -> zero update).
        lamp = 1e-10 * jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None]
        eye2 = jnp.eye(2, dtype=dtype)
        Hpp_d = Hpp + lamp * eye2 + 1e-20 * eye2
        Hpp_inv = _inv2(Hpp_d)
        # Schur complement onto cameras.
        S = Hcc - jnp.einsum("nij,njk,nlk->il", Hcp, Hpp_inv, Hcp)
        g = gc - jnp.einsum("nij,njk,nk->i", Hcp, Hpp_inv, gp)
        lamc = 1e-10 * jnp.trace(S)
        dc = linalg.solve_gauss(S + lamc * jnp.eye(8, dtype=dtype), g)
        dc = jnp.where(jnp.isfinite(dc), dc, 0.0)
        dp = jnp.einsum("nij,nj->ni", Hpp_inv,
                        gp - jnp.einsum("nij,j->ni", jnp.swapaxes(Hcp, 1, 2), dc))
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0)
        return (camvec - dc, Xc - dp * weights[:, None]), None

    camvec0 = jnp.concatenate([theta0, phi0[None], t23_0])
    (camvec, Xf), _ = jax.lax.scan(gn_step, (camvec0, X0), None, length=iters)
    cams_out = _unpack_cams(camvec[:3], camvec[3], camvec[4:], cam0)
    return cams_out, Xf


def fourview_minimal_models(x1, x2, x3, x4, key: jax.Array):
    """Enumerate all 4-view models from one minimal sample.

    x1..x4: (..., S, 2) unit bearings of the sampled points (S >= 5).
    Returns (cams, X_sample, valid): cams (..., 16, 4, 2, 3) — the 2
    factorizations x 8 sign flips (``sfm2d.cc:391-441``) — X_sample
    (..., 16, S, 2) triangulated sample points from the first three views,
    and valid (..., 16).

    The fourth camera comes from ``abs_pose_2d`` on the sample points
    (``sfm2d.cc:435``).
    """
    T = trifocal_minimal(x1, x2, x3)
    P1, P2, P3, fact_valid = factorize_trifocal(T, key)  # (..., 2, 2, 3)

    H = metric_upgrade(P2, P3)
    P2 = jnp.einsum("...ij,...jk->...ik", P2, H)
    P3 = jnp.einsum("...ij,...jk->...ik", P3, H)

    def colnorm(P, c):
        return jnp.maximum(jnp.linalg.norm(P[..., :, c], axis=-1), 1e-30)

    P2 = P2 / colnorm(P2, 0)[..., None, None]
    P3 = P3 / colnorm(P3, 0)[..., None, None]
    s = colnorm(P2, 2)
    P2 = P2.at[..., :, 2].set(P2[..., :, 2] / s[..., None])
    P3 = P3.at[..., :, 2].set(P3[..., :, 2] / s[..., None])

    # Base normalization before flips (sfm2d.cc:417-418).
    t1n = colnorm(P2, 2)
    P3 = P3.at[..., :, 2].set(P3[..., :, 2] / t1n[..., None])
    P2 = P2.at[..., :, 2].set(P2[..., :, 2] / t1n[..., None])

    # 8 sign flips (flip translations, flip P2, flip P3), stacked with the
    # 2 factorizations into a 16-model axis.
    models_cams = []
    for flip1 in (1.0, -1.0):
        for flip2 in (1.0, -1.0):
            for flip3 in (1.0, -1.0):
                c2 = P2 * flip2
                c2 = c2.at[..., :, 2].set(c2[..., :, 2] * flip1)
                c3 = P3 * flip3
                c3 = c3.at[..., :, 2].set(c3[..., :, 2] * flip1)
                models_cams.append((c2, c3))

    cams_all = []
    X_all = []
    for c2, c3 in models_cams:
        cams3 = jnp.stack([jnp.broadcast_to(P1, c2.shape), c2, c3], axis=-3)
        # Triangulate the sample from views 1-3 (sfm2d.cc:433).
        x123 = jnp.stack([x1, x2, x3], axis=-2)  # (..., S, 3, 2)
        Xs = triangulate2d(cams3[..., None, :, :, :], x123)  # (..., S, 2)
        P4 = abs_pose_2d(x4, Xs)
        cams4 = jnp.concatenate([cams3, P4[..., None, :, :]], axis=-3)
        cams_all.append(cams4)
        X_all.append(Xs)

    cams = jnp.stack(cams_all, axis=-4)  # (..., 2, 8, 4, 2, 3) -> merge
    X_s = jnp.stack(X_all, axis=-3)      # (..., 2, 8, S, 2)
    lead = cams.shape[:-5]
    cams = cams.reshape(lead + (16, 4, 2, 3))
    X_s = X_s.reshape(lead + (16,) + X_s.shape[-2:])
    valid = jnp.repeat(fact_valid, 8, axis=-1)  # (..., 16)
    return cams, X_s, valid


def optimize_points_2d(cams: jax.Array, x: jax.Array, X: jax.Array,
                       iters: int = 8) -> jax.Array:
    """Points-only GN polish with cameras fixed (``sfm2d.cc:75-116``)."""
    xr = x[..., 0] / jnp.where(jnp.abs(x[..., 1]) < 1e-30, 1e-30, x[..., 1])

    def res(Xj, xrj):
        p = cam2_apply(cams, Xj[None, :])
        p1 = jnp.where(jnp.abs(p[..., 1]) < 1e-30, 1e-30, p[..., 1])
        return p[..., 0] / p1 - xrj

    def step(Xc, _):
        r = jax.vmap(res, in_axes=(0, 1))(Xc, xr)  # (N, 4)
        J = jax.vmap(jax.jacfwd(res, argnums=0), in_axes=(0, 1))(Xc, xr)
        H = jnp.einsum("nvi,nvj->nij", J, J)
        g = jnp.einsum("nvi,nv->ni", J, r)
        lam = 1e-10 * jnp.trace(H, axis1=-2, axis2=-1)[:, None, None]
        eye2 = jnp.eye(2, dtype=X.dtype)
        d = jnp.einsum("nij,nj->ni", _inv2(H + lam * eye2 + 1e-20 * eye2), g)
        d = jnp.where(jnp.isfinite(d), d, 0.0)
        return Xc - d, None

    Xf, _ = jax.lax.scan(step, X, None, length=iters)
    return Xf
