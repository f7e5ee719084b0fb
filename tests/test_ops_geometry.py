"""Unit tests for the core geometry ops (lie, cameras, lines, triangulation).

Test strategy mirrors the reference (SURVEY.md §4): synthetic ground-truth
scenes -> lift to the privacy representation -> run kernels -> compare
against hand-computed / numpy-computed values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserving_sfm_tpu.ops import cameras, lie, lines, triangulation


def random_rotation(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return q


class TestLie:
    def test_quat_rotmat_roundtrip(self):
        rng = np.random.default_rng(0)
        q = np.stack([random_rotation(rng) for _ in range(32)])
        R = lie.quat_to_rotmat(jnp.asarray(q))
        q2 = lie.rotmat_to_quat(R)
        np.testing.assert_allclose(np.abs(np.sum(q * np.asarray(q2), axis=-1)),
                                   1.0, atol=1e-10)

    def test_quat_rotate_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(np.stack([random_rotation(rng) for _ in range(8)]))
        v = jnp.asarray(rng.standard_normal((8, 3)))
        out = lie.quat_rotate(q, v)
        ref = jnp.einsum("bij,bj->bi", lie.quat_to_rotmat(q), v)
        np.testing.assert_allclose(out, ref, atol=1e-12)

    def test_rotmat_orthonormal(self):
        rng = np.random.default_rng(2)
        q = jnp.asarray(np.stack([random_rotation(rng) for _ in range(8)]))
        R = lie.quat_to_rotmat(q)
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)),
                                   atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-12)

    def test_from_two_vectors(self):
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.standard_normal((16, 3)))
        b = jnp.asarray(rng.standard_normal((16, 3)))
        q = lie.quat_from_two_vectors(a, b)
        rotated = lie.quat_rotate(q, a / jnp.linalg.norm(a, axis=-1, keepdims=True))
        np.testing.assert_allclose(
            rotated, np.asarray(b / jnp.linalg.norm(b, axis=-1, keepdims=True)),
            atol=1e-10)

    def test_from_two_vectors_antiparallel(self):
        a = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        q = lie.quat_from_two_vectors(a, -a)
        rotated = lie.quat_rotate(q, a)
        np.testing.assert_allclose(rotated, -a, atol=1e-9)

    def test_pose_inverse_and_center(self):
        rng = np.random.default_rng(4)
        q = jnp.asarray(random_rotation(rng))
        t = jnp.asarray(rng.standard_normal(3))
        qi, ti = lie.pose_inverse(q, t)
        x = jnp.asarray(rng.standard_normal(3))
        back = lie.quat_rotate(qi, lie.quat_rotate(q, x) + t) + ti
        np.testing.assert_allclose(back, x, atol=1e-12)
        center = lie.projection_center(q, t)
        np.testing.assert_allclose(lie.quat_rotate(q, center) + t,
                                   np.zeros(3), atol=1e-12)

    def test_cayley(self):
        c = jnp.asarray([[0.0, 0.0, 0.0], [0.3, -0.2, 0.5]])
        R = lie.cayley_to_rotmat(c)
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-12)
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (2, 3, 3)),
                                   atol=1e-12)


CAMERA_TEST_CASES = [
    ("SIMPLE_PINHOLE", [500.0, 320.0, 240.0]),
    ("PINHOLE", [500.0, 510.0, 320.0, 240.0]),
    ("SIMPLE_RADIAL", [500.0, 320.0, 240.0, 0.05]),
    ("RADIAL", [500.0, 320.0, 240.0, 0.03, -0.01]),
    ("OPENCV", [500.0, 510.0, 320.0, 240.0, 0.03, -0.01, 0.001, -0.002]),
    ("OPENCV_FISHEYE", [500.0, 510.0, 320.0, 240.0, 0.03, -0.01, 0.002, -0.001]),
    ("FULL_OPENCV", [500.0, 510.0, 320.0, 240.0, 0.03, -0.01, 0.001, -0.002,
                     0.001, 0.0005, -0.0002, 0.0001]),
    ("FOV", [500.0, 510.0, 320.0, 240.0, 0.8]),
    ("SIMPLE_RADIAL_FISHEYE", [500.0, 320.0, 240.0, 0.03]),
    ("RADIAL_FISHEYE", [500.0, 320.0, 240.0, 0.03, -0.01]),
    ("THIN_PRISM_FISHEYE", [500.0, 510.0, 320.0, 240.0, 0.03, -0.01, 0.001,
                            -0.002, 0.001, 0.0005, 0.0003, -0.0002]),
]


class TestCameras:
    @pytest.mark.parametrize("model,params", CAMERA_TEST_CASES,
                             ids=[c[0] for c in CAMERA_TEST_CASES])
    def test_world_image_roundtrip(self, model, params):
        rng = np.random.default_rng(5)
        params = jnp.asarray(params)
        uv = jnp.asarray(rng.uniform(-0.25, 0.25, (64, 2)))
        xy = cameras.world_to_image(model, params, uv)
        uv2 = cameras.image_to_world(model, params, xy)
        np.testing.assert_allclose(uv2, uv, atol=1e-6)

    def test_pinhole_exact(self):
        params = jnp.asarray([500.0, 510.0, 320.0, 240.0])
        uv = jnp.asarray([[0.1, -0.2]])
        xy = cameras.world_to_image("PINHOLE", params, uv)
        np.testing.assert_allclose(xy, [[500 * 0.1 + 320, 510 * -0.2 + 240]],
                                   atol=1e-12)

    def test_threshold_conversion(self):
        params = jnp.asarray([500.0, 510.0, 320.0, 240.0])
        th = cameras.image_to_world_threshold("PINHOLE", params, 12.0)
        np.testing.assert_allclose(th, 12.0 / 505.0, atol=1e-12)

    def test_bogus_params(self):
        assert cameras.has_bogus_params(
            "SIMPLE_RADIAL", [500.0, 320.0, 240.0, 5.0], 640, 480,
            0.1, 10.0, 1.0)
        assert not cameras.has_bogus_params(
            "SIMPLE_RADIAL", [500.0, 320.0, 240.0, 0.5], 640, 480,
            0.1, 10.0, 1.0)


def make_scene(rng, num_cams=4, num_points=50):
    """Synthetic upright scene fixture, after initializer_test.cc:52-98."""
    qvecs, tvecs = [], []
    for i in range(num_cams):
        angle = rng.uniform(-0.3, 0.3)
        qvec = np.array([np.cos(angle / 2), 0.0, np.sin(angle / 2), 0.0])
        # small random rotation on top
        dq = np.array([1.0, *rng.uniform(-0.05, 0.05, 3)])
        dq /= np.linalg.norm(dq)
        q = np.asarray(lie.quat_multiply(jnp.asarray(dq), jnp.asarray(qvec)))
        qvecs.append(q)
        tvecs.append(rng.uniform(-1, 1, 3))
    points = rng.uniform(-2, 2, (num_points, 3))
    points[:, 2] += 6.0  # in front of all cameras
    return np.stack(qvecs), np.stack(tvecs), points


class TestLines:
    def test_lift_and_zero_residual(self):
        rng = np.random.default_rng(7)
        qvecs, tvecs, points = make_scene(rng, num_cams=1)
        q, t = jnp.asarray(qvecs[0]), jnp.asarray(tvecs[0])
        xyz = lie.quat_rotate(q, jnp.asarray(points)) + t
        uv = xyz[:, :2] / xyz[:, 2:3]

        gravity = jnp.asarray(
            lie.quat_rotate(q, jnp.asarray([0.0, 1.0, 0.0])))
        aligned = jnp.asarray(rng.uniform(size=len(points)) < 0.5)
        key = jax.random.PRNGKey(0)
        ls = lines.lift_keypoints_to_lines(key, uv, gravity, aligned)

        # Every lifted line passes through its generating point.
        hom = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=-1)
        np.testing.assert_allclose(jnp.abs(jnp.sum(ls * hom, axis=-1)),
                                   0.0, atol=1e-9)
        # Normalization invariant ||l[:2]|| = 1.
        np.testing.assert_allclose(jnp.linalg.norm(ls[:, :2], axis=-1), 1.0,
                                   atol=1e-12)

        # Zero reprojection error at ground truth.
        proj = lie.pose_compose(q, t)
        params = jnp.asarray([500.0, 320.0, 240.0])
        err = lines.squared_line_reprojection_error(
            ls, jnp.asarray(points), proj, "SIMPLE_PINHOLE", params, 640, 480)
        in_img = err < lines.BIG
        assert int(in_img.sum()) > 0
        np.testing.assert_allclose(np.asarray(err)[np.asarray(in_img)], 0.0,
                                   atol=1e-9)

    def test_pixel_error_matches_manual(self):
        # Line x = 0 (l = (1, 0, 0)); point projecting to (0.1, 0.0).
        line = jnp.asarray([[1.0, 0.0, 0.0]])
        point = jnp.asarray([[0.1, 0.0, 1.0]])
        proj = jnp.broadcast_to(jnp.eye(3, 4), (1, 3, 4))
        params = jnp.asarray([100.0, 320.0, 240.0])
        err = lines.squared_line_reprojection_error(
            line, point, proj, "SIMPLE_PINHOLE", params, 640, 480)
        # distance 0.1 in normalized plane -> 10 px -> squared 100.
        np.testing.assert_allclose(err, [100.0], atol=1e-9)

    def test_angular_error_gating(self):
        line = jnp.asarray([[1.0, 0.0, 0.0]])
        behind = jnp.asarray([[0.0, 0.0, -1.0]])
        proj = jnp.broadcast_to(jnp.eye(3, 4), (1, 3, 4))
        params = jnp.asarray([100.0, 320.0, 240.0])
        err = lines.line_angular_error(line, behind, proj, "SIMPLE_PINHOLE",
                                       params, 640, 480)
        assert float(err[0]) >= 0.99 * lines.BIG

    def test_ba_residual_zero_at_gt(self):
        rng = np.random.default_rng(8)
        qvecs, tvecs, points = make_scene(rng, num_cams=1)
        q, t = jnp.asarray(qvecs[0]), jnp.asarray(tvecs[0])
        xyz = lie.quat_rotate(q, jnp.asarray(points)) + t
        uv = xyz[:, :2] / xyz[:, 2:3]
        gravity = lie.quat_rotate(q, jnp.asarray([0.0, 1.0, 0.0]))
        aligned = jnp.asarray(rng.uniform(size=len(points)) < 0.5)
        ls = lines.lift_keypoints_to_lines(jax.random.PRNGKey(1), uv, gravity,
                                           aligned)
        params = jnp.asarray([500.0, 320.0, 240.0])
        res = lines.line_ba_residual(ls, jnp.asarray(points), q, t,
                                     "SIMPLE_PINHOLE", params)
        np.testing.assert_allclose(res, 0.0, atol=1e-8)


class TestTriangulation:
    def test_dlt_recovers_points(self):
        rng = np.random.default_rng(9)
        qvecs, tvecs, points = make_scene(rng, num_cams=4, num_points=20)
        projs = lie.pose_compose(jnp.asarray(qvecs), jnp.asarray(tvecs))

        all_X = []
        for j in range(len(points)):
            ls = []
            for i in range(4):
                xyz = lie.quat_rotate(jnp.asarray(qvecs[i]),
                                      jnp.asarray(points[j])) + tvecs[i]
                uv = xyz[:2] / xyz[2]
                hom = jnp.concatenate([uv, jnp.ones(1)])
                d = jnp.asarray(rng.standard_normal(3))
                l = jnp.cross(d, hom)
                l = l / jnp.linalg.norm(l[:2])
                ls.append(l)
            X = triangulation.triangulate_multiview_lines(
                projs, jnp.stack(ls))
            all_X.append(np.asarray(X))
        np.testing.assert_allclose(np.stack(all_X), points, atol=1e-5)

    def test_dlt_masking(self):
        rng = np.random.default_rng(10)
        qvecs, tvecs, points = make_scene(rng, num_cams=4, num_points=1)
        projs = lie.pose_compose(jnp.asarray(qvecs), jnp.asarray(tvecs))
        pt = jnp.asarray(points[0])
        ls = []
        for i in range(4):
            xyz = lie.quat_rotate(jnp.asarray(qvecs[i]), pt) + tvecs[i]
            uv = xyz[:2] / xyz[2]
            hom = jnp.concatenate([uv, jnp.ones(1)])
            d = jnp.asarray(rng.standard_normal(3))
            l = jnp.cross(d, hom)
            ls.append(l / jnp.linalg.norm(l[:2]))
        ls = jnp.stack(ls)
        # Corrupt observation 3, then mask it out.
        ls_bad = ls.at[3].set(jnp.asarray([1.0, 0.0, 5.0]))
        mask = jnp.asarray([True, True, True, False])
        X = triangulation.triangulate_multiview_lines(projs, ls_bad, mask)
        np.testing.assert_allclose(np.asarray(X), points[0], atol=1e-5)

    def test_linear_triangulation(self):
        rng = np.random.default_rng(11)
        qvecs, tvecs, points = make_scene(rng, num_cams=4, num_points=1)
        projs = lie.pose_compose(jnp.asarray(qvecs), jnp.asarray(tvecs))
        pt = jnp.asarray(points[0])
        ls = []
        for i in range(4):
            xyz = lie.quat_rotate(jnp.asarray(qvecs[i]), pt) + tvecs[i]
            uv = xyz[:2] / xyz[2]
            hom = jnp.concatenate([uv, jnp.ones(1)])
            d = jnp.asarray(rng.standard_normal(3))
            l = jnp.cross(d, hom)
            ls.append(l / jnp.linalg.norm(l[:2]))
        X = triangulation.triangulate_linear(projs, jnp.stack(ls))
        np.testing.assert_allclose(np.asarray(X), points[0], atol=1e-6)

    def test_triangulation_angle(self):
        c1 = jnp.asarray([0.0, 0.0, 0.0])
        c2 = jnp.asarray([1.0, 0.0, 0.0])
        X = jnp.asarray([0.5, 0.0, 0.5])
        ang = triangulation.triangulation_angle(c1, c2, X)
        np.testing.assert_allclose(float(ang), np.pi / 2, atol=1e-9)
