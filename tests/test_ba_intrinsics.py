"""Variable-intrinsics bundle adjustment (optim/ba_intrinsics.py).

The privacy lift bakes intrinsics into the stored lines, so "wrong focal"
means the lines pass through scaled normalized points; the solver must
recover the true focal through the projective line correction (see the
module docstring of optim/ba_intrinsics.py).
"""

import jax.numpy as jnp
import numpy as np

from privacy_preserving_sfm_tpu.ops import lie
from privacy_preserving_sfm_tpu.optim import ba, ba_intrinsics

from test_ba import make_ba_problem


def _mislift(problem, f_true=500.0, f_lift=500.0, c_shift=(0.0, 0.0)):
    """Re-lift the problem's lines as if the pixel measurements had been
    normalized with (f_lift, cx0+c_shift) instead of the true (f_true, cx0).

    make_ba_problem builds lines through the TRUE normalized points x̂;
    the mis-lifted line passes through x̂' = (f_true x̂ + c_true -
    c_lift) / f_lift, an affinity of the plane — transform the stored
    lines by its inverse-transpose.
    """
    lines = np.asarray(problem.obs_line)
    a, b, c = lines[:, 0], lines[:, 1], lines[:, 2]
    s = f_true / f_lift
    dx, dy = -c_shift[0] / f_lift, -c_shift[1] / f_lift
    # x̂' = s x̂ + (dx, dy);  l' = H^{-T} l with H = [[s,0,dx],[0,s,dy],[0,0,1]]
    a2, b2 = a / s, b / s
    c2 = c - a2 * dx - b2 * dy
    out = np.stack([a2, b2, c2], axis=-1)
    out /= np.linalg.norm(out[:, :2], axis=-1, keepdims=True)
    return problem._replace(obs_line=jnp.asarray(out))


def _wrap(problem, model, mask_flags=(True, False, False), num_unique=1,
          lift_focal=500.0):
    C = problem.qvecs.shape[0]
    params = np.array([lift_focal, 320.0, 240.0])
    mask = ba_intrinsics.intr_mask_for_model(model, *mask_flags)
    intr = np.tile(params, (num_unique, 1))
    cam_of_slot = np.arange(C) % num_unique
    return ba_intrinsics.IntrBAProblem(
        base=problem,
        cam_of_slot=jnp.asarray(cam_of_slot, jnp.int32),
        intr_params=jnp.asarray(intr),
        intr_mask=jnp.asarray(np.tile(mask, (num_unique, 1))),
        lift_params=jnp.asarray(intr))


class TestBundleAdjustIntrinsics:
    def test_recovers_focal_shared_camera(self):
        """Lines lifted with a 12%-wrong focal; one shared camera."""
        rng = np.random.default_rng(0)
        problem, qs, ts, pts = make_ba_problem(rng, num_cams=8,
                                               num_points=120,
                                               perturb=0.01)
        problem = _mislift(problem, f_true=500.0, f_lift=560.0)
        iproblem = _wrap(problem, "SIMPLE_PINHOLE", lift_focal=560.0)
        q, t, X, intr, summary = ba_intrinsics.bundle_adjust_intrinsics(
            iproblem, "SIMPLE_PINHOLE", ba.BAOptions(max_iterations=200))
        assert float(summary.final_cost) < 1e-8, float(summary.final_cost)
        np.testing.assert_allclose(float(intr[0, 0]), 500.0, rtol=1e-2)
        # Principal point frozen by the mask.
        np.testing.assert_allclose(np.asarray(intr[0, 1:]),
                                   [320.0, 240.0], atol=1e-12)

    def test_constant_when_fully_masked(self):
        """Zero intrinsics mask == the plain bundle adjuster."""
        rng = np.random.default_rng(1)
        problem, qs, ts, pts = make_ba_problem(rng)
        iproblem = _wrap(problem, "SIMPLE_PINHOLE",
                         mask_flags=(False, False, False))
        q, t, X, intr, s = ba_intrinsics.bundle_adjust_intrinsics(
            iproblem, "SIMPLE_PINHOLE", ba.BAOptions())
        q0, t0, X0, s0 = ba.bundle_adjust(problem, "SIMPLE_PINHOLE",
                                          ba.BAOptions())
        np.testing.assert_allclose(np.asarray(intr[0]),
                                   [500.0, 320.0, 240.0], atol=1e-12)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t0), atol=1e-8)
        np.testing.assert_allclose(np.asarray(X), np.asarray(X0), atol=1e-8)

    def test_principal_point_shift(self):
        """Lines lifted with a 6px-wrong principal point; recover it."""
        rng = np.random.default_rng(2)
        problem, qs, ts, pts = make_ba_problem(rng, num_cams=8,
                                               num_points=120,
                                               perturb=0.005)
        problem = _mislift(problem, c_shift=(6.0, -4.0))
        iproblem = _wrap(problem, "SIMPLE_PINHOLE",
                         mask_flags=(False, True, False))
        q, t, X, intr, summary = ba_intrinsics.bundle_adjust_intrinsics(
            iproblem, "SIMPLE_PINHOLE", ba.BAOptions(max_iterations=200))
        assert float(summary.final_cost) < 1e-8, float(summary.final_cost)
        # Lifted with c_lift = c_true + (6, -4): the solver must recover
        # the TRUE principal point c_lift - shift = (314, 244).
        np.testing.assert_allclose(np.asarray(intr[0, 1:]),
                                   [320.0 - 6.0, 240.0 + 4.0], atol=0.2)

    def test_correct_lines_roundtrip(self):
        """Baking the correction into lines reproduces the plain residual."""
        rng = np.random.default_rng(3)
        problem, qs, ts, pts = make_ba_problem(rng)
        problem = _mislift(problem, f_true=500.0, f_lift=550.0)
        lift = np.array([550.0, 320.0, 240.0])
        fixed = np.array([500.0, 320.0, 240.0])
        corrected = ba_intrinsics.correct_lines(
            np.asarray(problem.obs_line), lift, fixed, "SIMPLE_PINHOLE")
        # Corrected lines + true intrinsics must fit the GT scene exactly.
        base = problem._replace(
            obs_line=jnp.asarray(corrected),
            cam_params=jnp.asarray(np.tile(fixed, (problem.qvecs.shape[0],
                                                   1))),
            qvecs=jnp.asarray(qs), tvecs=jnp.asarray(ts),
            points3d=jnp.asarray(pts))
        from privacy_preserving_sfm_tpu.optim.ba import _cost
        c = _cost(base, base.qvecs, base.tvecs, base.points3d,
                  "SIMPLE_PINHOLE", "trivial", 1.0)
        assert float(c) < 1e-12, float(c)
