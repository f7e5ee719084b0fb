"""Tests for the implicit-Schur LM bundle adjuster."""

import jax
import jax.numpy as jnp
import numpy as np

from privacy_preserving_sfm_tpu.ops import lie, lines as line_ops
from privacy_preserving_sfm_tpu.optim import ba


def make_ba_problem(rng, num_cams=6, num_points=80, aligned_ratio=0.5,
                    perturb=0.02, camera_model="SIMPLE_PINHOLE"):
    params = np.array([500.0, 320.0, 240.0])
    qs, ts = [], []
    for i in range(num_cams):
        yaw = rng.uniform(-0.4, 0.4)
        q = np.array([np.cos(yaw / 2), 0, np.sin(yaw / 2), 0])
        dq = np.array([1.0, *rng.normal(0, 0.05, 3)])
        dq /= np.linalg.norm(dq)
        qs.append(np.asarray(lie.quat_multiply(jnp.asarray(dq), jnp.asarray(q))))
        ts.append(rng.uniform(-1, 1, 3))
    qs, ts = np.stack(qs), np.stack(ts)
    pts = rng.uniform(-2, 2, (num_points, 3))
    pts[:, 2] += 6.0

    obs_cam, obs_point, obs_line = [], [], []
    for c in range(num_cams):
        R = np.asarray(lie.quat_to_rotmat(jnp.asarray(qs[c])))
        Xc = pts @ R.T + ts[c]
        uv = Xc[:, :2] / Xc[:, 2:3]
        g = R @ np.array([0.0, 1.0, 0.0])
        aligned = rng.uniform(size=num_points) < aligned_ratio
        dirs = np.where(aligned[:, None], np.broadcast_to(g, (num_points, 3)),
                        rng.standard_normal((num_points, 3)))
        hom = np.concatenate([uv, np.ones((num_points, 1))], axis=1)
        ls = np.cross(dirs, hom)
        ls /= np.linalg.norm(ls[:, :2], axis=-1, keepdims=True)
        for j in range(num_points):
            obs_cam.append(c)
            obs_point.append(j)
            obs_line.append(ls[j])

    # Perturb everything except the gauge (cam0 pose + cam1 tvec[0]).
    qs_p, ts_p = qs.copy(), ts.copy()
    for i in range(1, num_cams):
        dq = np.array([1.0, *rng.normal(0, perturb, 3)])
        dq /= np.linalg.norm(dq)
        qs_p[i] = np.asarray(lie.quat_multiply(jnp.asarray(qs[i]),
                                               jnp.asarray(dq)))
        ts_p[i] = ts[i] + rng.normal(0, perturb, 3)
    ts_p[1, 0] = ts[1, 0]  # gauge: tvec[0] of camera 1 fixed at GT
    pts_p = pts + rng.normal(0, perturb, pts.shape)

    cam_dof_mask = np.ones((num_cams, 6))
    cam_dof_mask[0] = 0.0
    cam_dof_mask[1, 3] = 0.0  # freeze t_x of camera 1

    problem = ba.BAProblem(
        qvecs=jnp.asarray(qs_p),
        tvecs=jnp.asarray(ts_p),
        cam_params=jnp.broadcast_to(jnp.asarray(params), (num_cams, 3)),
        points3d=jnp.asarray(pts_p),
        obs_cam=jnp.asarray(obs_cam, dtype=jnp.int32),
        obs_point=jnp.asarray(obs_point, dtype=jnp.int32),
        obs_line=jnp.asarray(np.stack(obs_line)),
        obs_weight=jnp.ones(len(obs_cam)),
        cam_dof_mask=jnp.asarray(cam_dof_mask),
        point_mask=jnp.ones(num_points),
    )
    return problem, qs, ts, pts


class TestBundleAdjust:
    def test_recovers_ground_truth(self):
        rng = np.random.default_rng(0)
        problem, qs, ts, pts = make_ba_problem(rng)
        q, t, X, summary = ba.bundle_adjust(problem, "SIMPLE_PINHOLE")
        assert float(summary.final_cost) < 1e-14, float(summary.final_cost)
        # Gauge is pinned, so the GT is the unique optimum.
        np.testing.assert_allclose(np.asarray(t), ts, atol=1e-5)
        np.testing.assert_allclose(np.asarray(X), pts, atol=1e-5)
        for i in range(len(qs)):
            ang = float(lie.rotmat_angular_distance(
                lie.quat_to_rotmat(jnp.asarray(qs[i])),
                lie.quat_to_rotmat(q[i])))
            assert ang < 1e-5

    def test_gauge_respected(self):
        rng = np.random.default_rng(1)
        problem, qs, ts, pts = make_ba_problem(rng)
        q, t, X, _ = ba.bundle_adjust(problem, "SIMPLE_PINHOLE")
        np.testing.assert_allclose(np.asarray(q[0]), problem.qvecs[0],
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(t[0]), problem.tvecs[0],
                                   atol=1e-12)
        np.testing.assert_allclose(float(t[1, 0]), float(problem.tvecs[1, 0]),
                                   atol=1e-12)

    def test_constant_points(self):
        rng = np.random.default_rng(2)
        problem, qs, ts, pts = make_ba_problem(rng)
        pm = np.ones(len(pts))
        pm[:10] = 0.0
        problem = problem._replace(point_mask=jnp.asarray(pm))
        q, t, X, _ = ba.bundle_adjust(problem, "SIMPLE_PINHOLE")
        np.testing.assert_allclose(np.asarray(X[:10]), problem.points3d[:10],
                                   atol=1e-12)

    def test_robust_loss_with_outliers(self):
        rng = np.random.default_rng(3)
        problem, qs, ts, pts = make_ba_problem(rng, perturb=0.01)
        # Corrupt 10% of observations.
        lines = np.array(problem.obs_line)
        n_obs = len(lines)
        bad = rng.choice(n_obs, n_obs // 10, replace=False)
        garbage = rng.standard_normal((len(bad), 3))
        garbage /= np.linalg.norm(garbage[:, :2], axis=-1, keepdims=True)
        lines[bad] = garbage
        problem = problem._replace(obs_line=jnp.asarray(lines))
        opts = ba.BAOptions(loss="cauchy", loss_scale=1.0, max_iterations=50)
        q, t, X, _ = ba.bundle_adjust(problem, "SIMPLE_PINHOLE", opts)
        np.testing.assert_allclose(np.asarray(t), ts, atol=2e-3)
        for i in range(len(qs)):
            ang = float(lie.rotmat_angular_distance(
                lie.quat_to_rotmat(jnp.asarray(qs[i])),
                lie.quat_to_rotmat(q[i])))
            assert ang < 2e-3

    def test_padded_observations(self):
        rng = np.random.default_rng(4)
        problem, qs, ts, pts = make_ba_problem(rng)
        # Append garbage observations with weight 0.
        pad = 50
        problem = problem._replace(
            obs_cam=jnp.concatenate([problem.obs_cam,
                                     jnp.zeros(pad, jnp.int32)]),
            obs_point=jnp.concatenate([problem.obs_point,
                                       jnp.zeros(pad, jnp.int32)]),
            obs_line=jnp.concatenate([
                problem.obs_line,
                jnp.asarray(np.tile([1.0, 0.0, 99.0], (pad, 1)))]),
            obs_weight=jnp.concatenate([problem.obs_weight, jnp.zeros(pad)]),
        )
        q, t, X, summary = ba.bundle_adjust(problem, "SIMPLE_PINHOLE")
        assert float(summary.final_cost) < 1e-14
        np.testing.assert_allclose(np.asarray(t), ts, atol=1e-5)

    def test_jit(self):
        rng = np.random.default_rng(5)
        problem, qs, ts, pts = make_ba_problem(rng)
        f = jax.jit(lambda p: ba.bundle_adjust(p, "SIMPLE_PINHOLE"))
        q, t, X, summary = f(problem)
        assert float(summary.final_cost) < 1e-12


class TestDenseBA:
    def test_matches_flat_solver(self):
        from privacy_preserving_sfm_tpu.optim import ba_dense

        rng = np.random.default_rng(10)
        problem, qs, ts, pts = make_ba_problem(rng)
        q1, t1, X1, s1 = ba.bundle_adjust(problem, "SIMPLE_PINHOLE")
        dense = ba_dense.from_flat_problem(problem)
        q2, t2, X2, s2 = ba_dense.bundle_adjust_dense(dense, "SIMPLE_PINHOLE")
        assert float(s2.final_cost) < 1e-14
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(X2), np.asarray(X1), atol=1e-6)

    def test_dense_respects_masks(self):
        from privacy_preserving_sfm_tpu.optim import ba_dense

        rng = np.random.default_rng(11)
        problem, qs, ts, pts = make_ba_problem(rng)
        pm = np.ones(len(pts))
        pm[:5] = 0.0
        problem = problem._replace(point_mask=jnp.asarray(pm))
        dense = ba_dense.from_flat_problem(problem)
        q, t, X, _ = ba_dense.bundle_adjust_dense(dense, "SIMPLE_PINHOLE")
        np.testing.assert_allclose(np.asarray(X[:5]), problem.points3d[:5],
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(q[0]), problem.qvecs[0],
                                   atol=1e-12)


def test_bucket_cams_covers_every_count():
    """Regression: the C ladder must never pad BELOW the camera count.

    Round 4 hit an IndexError at the first box300 161-camera global BA:
    the 129..170 rung returned 160, smaller than n_cam.  The shipped
    ladder (eb06894) is 16/64/128 then multiples of 64, keeping every
    rung up to 512 inside the SoA explicit-Schur regime."""
    from privacy_preserving_sfm_tpu.sfm.incremental_mapper import _bucket_cams

    prev = 0
    for n in range(1, 1400):
        c = _bucket_cams(n)
        assert c >= n, (n, c)
        assert c >= prev, (n, c, prev)  # monotone: keys only accrue
        prev = c
    # Spot-check the intended rungs (multiples of 64 past 128).
    assert _bucket_cams(10) == 16
    assert _bucket_cams(64) == 64
    assert _bucket_cams(100) == 128
    assert _bucket_cams(161) == 192
    assert _bucket_cams(171) == 192
    assert _bucket_cams(300) == 320
    # Boundary cases around the C<=512 SoA explicit-Schur ceiling.
    assert _bucket_cams(449) == 512
    assert _bucket_cams(512) == 512
    assert _bucket_cams(513) == 576
