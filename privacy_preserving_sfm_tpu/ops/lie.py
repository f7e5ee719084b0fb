"""Quaternion / rotation utilities (batched, jit-friendly).

Conventions match the reference (``src/base/pose.cc:34-127``):
  * quaternions are ``(w, x, y, z)`` scalar-first,
  * a pose ``(qvec, tvec)`` maps world points into the camera frame:
    ``x_cam = R(qvec) @ x_world + tvec``,
  * projection matrices are ``[R | t]`` with shape ``(3, 4)``.

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) to unit norm. q: (..., 4)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) -> rotation matrix. (..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz,
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w,x,y,z), branch-free.

    Uses the four Shepperd candidates and selects the best-conditioned one
    with ``argmax`` (static control flow, safe under vmap/jit).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate (unnormalized) quaternions; candidate i is numerically
    # reliable when its pivot (1 + diag combination) is the largest.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.maximum(qw, 1e-12)
    s = jnp.sqrt(qw)

    cand = jnp.stack(
        [
            jnp.stack([s[..., 0], (m21 - m12) / s[..., 0],
                       (m02 - m20) / s[..., 0], (m10 - m01) / s[..., 0]], axis=-1),
            jnp.stack([(m21 - m12) / s[..., 1], s[..., 1],
                       (m01 + m10) / s[..., 1], (m02 + m20) / s[..., 1]], axis=-1),
            jnp.stack([(m02 - m20) / s[..., 2], (m01 + m10) / s[..., 2],
                       s[..., 2], (m12 + m21) / s[..., 2]], axis=-1),
            jnp.stack([(m10 - m01) / s[..., 3], (m02 + m20) / s[..., 3],
                       (m12 + m21) / s[..., 3], s[..., 3]], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    best = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q. (...,4),(...,3)->(...,3)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2, both (w,x,y,z)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_from_two_vectors(a: jax.Array, b: jax.Array) -> jax.Array:
    """Shortest-arc unit quaternion rotating direction a onto direction b.

    Behavioral twin of ``Eigen::Quaterniond::FromTwoVectors`` as used for the
    gravity pre-rotation (reference ``src/init/initializer.cc:73``).
    Handles the antiparallel case branch-free by falling back to a rotation of
    pi about an axis orthogonal to ``a``.
    """
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    q = jnp.concatenate([1.0 + d, c], axis=-1)
    # Antiparallel fallback: any axis orthogonal to a.
    ortho = jnp.cross(a, jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], dtype=a.dtype), a.shape))
    ortho_alt = jnp.cross(a, jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], dtype=a.dtype), a.shape))
    use_alt = jnp.linalg.norm(ortho, axis=-1, keepdims=True) < 1e-6
    ortho = jnp.where(use_alt, ortho_alt, ortho)
    q_pi = jnp.concatenate([jnp.zeros_like(d), ortho], axis=-1)
    antiparallel = d < (-1.0 + 1e-9)
    q = jnp.where(antiparallel, q_pi, q)
    return quat_normalize(q)


def pose_compose(qvec: jax.Array, tvec: jax.Array) -> jax.Array:
    """(qvec, tvec) -> 3x4 projection matrix [R | t].

    Mirrors ``ComposeProjectionMatrix`` (reference ``src/base/pose.cc``).
    """
    R = quat_to_rotmat(quat_normalize(qvec))
    return jnp.concatenate([R, tvec[..., :, None]], axis=-1)


def pose_inverse(qvec: jax.Array, tvec: jax.Array):
    """Invert a world->camera pose. Returns (qvec_inv, tvec_inv)."""
    q_inv = quat_conjugate(quat_normalize(qvec))
    t_inv = -quat_rotate(q_inv, tvec)
    return q_inv, t_inv


def projection_center(qvec: jax.Array, tvec: jax.Array) -> jax.Array:
    """Camera center in world coordinates: C = -R^T t."""
    return -quat_rotate(quat_conjugate(quat_normalize(qvec)), tvec)


def pose_relative(q1, t1, q2, t2):
    """Relative pose taking camera-1 frame to camera-2 frame: (q21, t21)."""
    q21 = quat_multiply(q2, quat_conjugate(quat_normalize(q1)))
    t21 = t2 - quat_rotate(q21, t1)
    return q21, t21


def cayley_to_rotmat(c: jax.Array) -> jax.Array:
    """Cayley parametrization c=(c0,c1,c2) -> rotation matrix.

    R = ((1 - |c|^2) I + 2 c c^T + 2 [c]_x) / (1 + |c|^2); this is the
    parametrization the P6L solver uses for its rotation unknowns
    (reference ``src/estimators/absolute_pose.cc:64-75``).
    """
    c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
    n2 = c0 * c0 + c1 * c1 + c2 * c2
    m = jnp.stack(
        [
            1 + c0 * c0 - c1 * c1 - c2 * c2, 2 * (c0 * c1 - c2), 2 * (c1 + c0 * c2),
            2 * (c2 + c0 * c1), 1 - c0 * c0 + c1 * c1 - c2 * c2, 2 * (c1 * c2 - c0),
            2 * (c0 * c2 - c1), 2 * (c0 + c1 * c2), 1 - c0 * c0 - c1 * c1 + c2 * c2,
        ],
        axis=-1,
    ).reshape(c.shape[:-1] + (3, 3))
    return m / (1.0 + n2)[..., None, None]


def rotmat_angular_distance(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Angle (radians) of the relative rotation between R1 and R2."""
    Rrel = jnp.einsum("...ij,...kj->...ik", R1, R2)
    tr = jnp.trace(Rrel, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos)
