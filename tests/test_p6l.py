"""Tests for the P6L minimal solver and RANSAC absolute pose from lines.

Fixture pattern follows the reference tests (``initializer_test.cc:52-155``):
synthetic upright scene -> lift GT points to aligned/random lines ->
solve -> compare to GT pose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserving_sfm_tpu.ops import lie, lines as line_ops
from privacy_preserving_sfm_tpu.solvers import p6l, ransac


def make_pose_scene(rng, n=100, aligned_ratio=0.5, noise=0.0):
    """One camera, N points in front, lifted to lines (half aligned)."""
    # Random upright-ish pose.
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    t = rng.uniform(-1, 1, 3)
    points = rng.uniform(-2, 2, (n, 3))
    points[:, 2] += 6.0
    # Points in camera frame must be in front.
    R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
    Xc = points @ R.T + t
    keep_front = Xc[:, 2] > 0.2
    # Move behind-camera points in front by shifting along the view ray.
    points[~keep_front] = (np.linalg.inv(R) @ (np.array([0, 0, 5.0]) - t)) + \
        rng.uniform(-0.5, 0.5, (int((~keep_front).sum()), 3))
    Xc = points @ R.T + t

    uv = Xc[:, :2] / Xc[:, 2:3]
    if noise:
        uv = uv + rng.normal(0, noise, uv.shape)
    gravity = R @ np.array([0.0, 1.0, 0.0])
    aligned = rng.uniform(size=n) < aligned_ratio
    ls = np.array(line_ops.lift_keypoints_to_lines(
        jax.random.PRNGKey(1), jnp.asarray(uv), jnp.asarray(gravity),
        jnp.asarray(aligned)))  # np.array -> writable copy
    return q, t, points, ls, aligned


def pose_errors(q_gt, t_gt, q, t):
    ang = float(lie.rotmat_angular_distance(
        lie.quat_to_rotmat(jnp.asarray(q_gt)),
        lie.quat_to_rotmat(jnp.asarray(q))))
    dt = float(np.linalg.norm(np.asarray(t) - t_gt))
    return ang, dt


class TestP6LMinimal:
    def test_exact_minimal_recovery(self):
        rng = np.random.default_rng(0)
        found = 0
        for trial in range(8):
            q, t, points, ls, aligned = make_pose_scene(rng, n=6)
            if aligned.all():
                continue
            poses, valid = p6l.p6l_minimal(
                jnp.asarray(ls)[None], jnp.asarray(points)[None])
            poses, valid = np.asarray(poses)[0], np.asarray(valid)[0]
            best = np.inf
            for i in range(8):
                if not valid[i]:
                    continue
                ang, dt = pose_errors(
                    q, t, lie.rotmat_to_quat(jnp.asarray(poses[i, :, :3])),
                    poses[i, :, 3])
                best = min(best, ang + dt)
            if best < 1e-5:
                found += 1
        assert found >= 6, f"recovered {found}/8 scenes"

    def test_batched_solver(self):
        rng = np.random.default_rng(1)
        batch_l, batch_p, gts = [], [], []
        for _ in range(16):
            q, t, points, ls, aligned = make_pose_scene(rng, n=6,
                                                        aligned_ratio=0.3)
            batch_l.append(ls)
            batch_p.append(points)
            gts.append((q, t))
        poses, valid = p6l.p6l_minimal(jnp.asarray(np.stack(batch_l)),
                                       jnp.asarray(np.stack(batch_p)))
        poses, valid = np.asarray(poses), np.asarray(valid)
        ok = 0
        for b, (q, t) in enumerate(gts):
            best = np.inf
            for i in range(8):
                if not valid[b, i]:
                    continue
                ang, dt = pose_errors(
                    q, t, lie.rotmat_to_quat(jnp.asarray(poses[b, i, :, :3])),
                    poses[b, i, :, 3])
                best = min(best, ang + dt)
            ok += best < 1e-5
        assert ok >= 13, f"{ok}/16 batched scenes recovered"


class TestRansacPose:
    def test_clean_data(self):
        rng = np.random.default_rng(2)
        q, t, points, ls, aligned = make_pose_scene(rng, n=80)
        res = p6l.estimate_absolute_pose_from_lines(
            jax.random.PRNGKey(0), jnp.asarray(ls), jnp.asarray(aligned),
            jnp.asarray(points), jnp.ones(80, bool), 1e-4,
            num_hypotheses=512)
        assert bool(res.success)
        ang, dt = pose_errors(q, t, res.qvec, res.tvec)
        assert ang < 1e-4 and dt < 1e-4, (ang, dt)
        assert int(res.num_inliers) > 70

    def test_with_outliers(self):
        rng = np.random.default_rng(3)
        q, t, points, ls, aligned = make_pose_scene(rng, n=100)
        # 25% outliers: replace lines with random ones.
        n_out = 25
        out_idx = rng.choice(100, n_out, replace=False)
        bad = rng.standard_normal((n_out, 3))
        bad /= np.linalg.norm(bad[:, :2], axis=-1, keepdims=True)
        ls[out_idx] = bad
        res = p6l.estimate_absolute_pose_from_lines(
            jax.random.PRNGKey(0), jnp.asarray(ls), jnp.asarray(aligned),
            jnp.asarray(points), jnp.ones(100, bool), 1e-4,
            num_hypotheses=2048)
        assert bool(res.success)
        ang, dt = pose_errors(q, t, res.qvec, res.tvec)
        assert ang < 1e-3 and dt < 1e-3, (ang, dt)
        assert int(res.num_inliers) >= 70

    def test_padding_mask(self):
        rng = np.random.default_rng(4)
        q, t, points, ls, aligned = make_pose_scene(rng, n=60)
        # Pad to 100 with garbage, masked out.
        pad = 40
        ls_p = np.concatenate([ls, rng.standard_normal((pad, 3))])
        ls_p[60:] /= np.linalg.norm(ls_p[60:, :2], axis=-1, keepdims=True)
        pts_p = np.concatenate([points, rng.standard_normal((pad, 3))])
        al_p = np.concatenate([aligned, np.zeros(pad, bool)])
        valid = np.concatenate([np.ones(60, bool), np.zeros(pad, bool)])
        res = p6l.estimate_absolute_pose_from_lines(
            jax.random.PRNGKey(0), jnp.asarray(ls_p), jnp.asarray(al_p),
            jnp.asarray(pts_p), jnp.asarray(valid), 1e-4,
            num_hypotheses=512)
        assert bool(res.success)
        ang, dt = pose_errors(q, t, res.qvec, res.tvec)
        assert ang < 1e-4 and dt < 1e-4
        # Inliers must not include padding.
        assert not np.asarray(res.inlier_mask)[60:].any()

    def test_all_aligned_fails(self):
        rng = np.random.default_rng(5)
        q, t, points, ls, aligned = make_pose_scene(rng, n=50,
                                                    aligned_ratio=1.0)
        res = p6l.estimate_absolute_pose_from_lines(
            jax.random.PRNGKey(0), jnp.asarray(ls),
            jnp.asarray(np.ones(50, bool)), jnp.asarray(points),
            jnp.ones(50, bool), 1e-4, num_hypotheses=256)
        # >90% aligned inliers -> degeneracy guard rejects (pose.cc:69-83).
        assert not bool(res.success)


class TestRefinement:
    def test_refine_recovers_from_perturbation(self):
        rng = np.random.default_rng(6)
        q, t, points, ls, aligned = make_pose_scene(rng, n=120)
        # Perturb the pose.
        dq = np.array([1.0, *rng.normal(0, 0.01, 3)])
        dq /= np.linalg.norm(dq)
        q0 = np.asarray(lie.quat_multiply(jnp.asarray(q), jnp.asarray(dq)))
        t0 = t + rng.normal(0, 0.05, 3)
        params = jnp.asarray([500.0, 320.0, 240.0])
        q1, t1 = p6l.refine_absolute_pose_from_lines(
            jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(ls),
            jnp.asarray(points), jnp.ones(120), "SIMPLE_PINHOLE", params)
        ang0, dt0 = pose_errors(q, t, q0, t0)
        ang1, dt1 = pose_errors(q, t, q1, t1)
        assert ang1 < 1e-6 and dt1 < 1e-6, (ang0, dt0, ang1, dt1)

    def test_refine_robust_to_outliers(self):
        rng = np.random.default_rng(7)
        q, t, points, ls, aligned = make_pose_scene(rng, n=120)
        mask = np.ones(120)
        # Corrupt 20 observations but keep them in the mask; Cauchy loss
        # should keep the solution close.
        bad_idx = rng.choice(120, 20, replace=False)
        bad = rng.standard_normal((20, 3))
        bad /= np.linalg.norm(bad[:, :2], axis=-1, keepdims=True)
        ls[bad_idx] = bad
        dq = np.array([1.0, *rng.normal(0, 0.005, 3)])
        dq /= np.linalg.norm(dq)
        q0 = np.asarray(lie.quat_multiply(jnp.asarray(q), jnp.asarray(dq)))
        t0 = t + rng.normal(0, 0.02, 3)
        params = jnp.asarray([500.0, 320.0, 240.0])
        q1, t1 = p6l.refine_absolute_pose_from_lines(
            jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(ls),
            jnp.asarray(points), jnp.asarray(mask), "SIMPLE_PINHOLE", params)
        ang1, dt1 = pose_errors(q, t, q1, t1)
        assert ang1 < 5e-3 and dt1 < 5e-3, (ang1, dt1)
