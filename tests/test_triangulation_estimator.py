"""Tests for the robust LORANSAC triangulation estimator."""

import jax
import jax.numpy as jnp
import numpy as np

from privacy_preserving_sfm_tpu.ops import lie, lines as line_ops
from privacy_preserving_sfm_tpu.solvers import triangulation as tri_est


def make_track(rng, n_obs=8, noise=0.0):
    """One 3D point observed as lines from n_obs cameras."""
    point = rng.uniform(-1, 1, 3) + np.array([0, 0, 5.0])
    qs, ts, lines = [], [], []
    for i in range(n_obs):
        ang = rng.uniform(-0.5, 0.5)
        q = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0])
        t = rng.uniform(-2, 2, 3) * np.array([1, 0.3, 1])
        R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
        Xc = R @ point + t
        assert Xc[2] > 0.3
        uv = Xc[:2] / Xc[2]
        if noise:
            uv = uv + rng.normal(0, noise, 2)
        hom = np.concatenate([uv, [1.0]])
        d = rng.standard_normal(3)
        l = np.cross(d, hom)
        l /= np.linalg.norm(l[:2])
        qs.append(q)
        ts.append(t)
        lines.append(l)
    projs = np.asarray(lie.pose_compose(jnp.asarray(np.stack(qs)),
                                        jnp.asarray(np.stack(ts))))
    centers = np.asarray(lie.projection_center(jnp.asarray(np.stack(qs)),
                                               jnp.asarray(np.stack(ts))))
    return point, np.stack(lines), projs, centers


class TestEstimateTriangulation:
    def test_clean_track(self):
        rng = np.random.default_rng(0)
        point, lines, projs, centers = make_track(rng, n_obs=8)
        params = jnp.broadcast_to(jnp.asarray([500.0, 320.0, 240.0]), (8, 3))
        res = tri_est.estimate_triangulation(
            jnp.asarray(lines), jnp.asarray(projs), jnp.asarray(centers),
            params, jnp.ones(8, bool), "SIMPLE_PINHOLE", 640, 480,
            max_angle_error_rad=np.deg2rad(2.0),
            min_tri_angle_rad=np.deg2rad(1.5))
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.point3d), point, atol=1e-5)
        assert int(res.num_inliers) >= 6  # some views may project off-image

    def test_track_with_outliers(self):
        rng = np.random.default_rng(1)
        point, lines, projs, centers = make_track(rng, n_obs=10)
        lines = np.array(lines)
        bad = rng.standard_normal((3, 3))
        bad /= np.linalg.norm(bad[:, :2], axis=-1, keepdims=True)
        lines[[1, 4, 7]] = bad
        params = jnp.broadcast_to(jnp.asarray([500.0, 320.0, 240.0]), (10, 3))
        res = tri_est.estimate_triangulation(
            jnp.asarray(lines), jnp.asarray(projs), jnp.asarray(centers),
            params, jnp.ones(10, bool), "SIMPLE_PINHOLE", 640, 480,
            max_angle_error_rad=np.deg2rad(2.0),
            min_tri_angle_rad=np.deg2rad(1.5))
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.point3d), point, atol=1e-4)

    def test_masked_padding(self):
        rng = np.random.default_rng(2)
        point, lines, projs, centers = make_track(rng, n_obs=5)
        # Pad to 8 with garbage.
        lines_p = np.concatenate([lines, rng.standard_normal((3, 3))])
        lines_p[5:] /= np.linalg.norm(lines_p[5:, :2], axis=-1, keepdims=True)
        projs_p = np.concatenate([projs, np.tile(np.eye(3, 4), (3, 1, 1))])
        centers_p = np.concatenate([centers, np.zeros((3, 3))])
        valid = np.asarray([True] * 5 + [False] * 3)
        params = jnp.broadcast_to(jnp.asarray([500.0, 320.0, 240.0]), (8, 3))
        res = tri_est.estimate_triangulation(
            jnp.asarray(lines_p), jnp.asarray(projs_p), jnp.asarray(centers_p),
            params, jnp.asarray(valid), "SIMPLE_PINHOLE", 640, 480,
            max_angle_error_rad=np.deg2rad(2.0),
            min_tri_angle_rad=np.deg2rad(1.5))
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.point3d), point, atol=1e-5)
        assert not np.asarray(res.inlier_mask)[5:].any()

    def test_vmap_over_tracks(self):
        rng = np.random.default_rng(3)
        tracks = [make_track(rng, n_obs=6) for _ in range(8)]
        lines = jnp.asarray(np.stack([t[1] for t in tracks]))
        projs = jnp.asarray(np.stack([t[2] for t in tracks]))
        centers = jnp.asarray(np.stack([t[3] for t in tracks]))
        params = jnp.broadcast_to(jnp.asarray([500.0, 320.0, 240.0]), (8, 6, 3))
        f = jax.vmap(lambda l, p, c, cp: tri_est.estimate_triangulation(
            l, p, c, cp, jnp.ones(6, bool), "SIMPLE_PINHOLE", 640, 480,
            np.deg2rad(2.0), np.deg2rad(1.5)))
        res = f(lines, projs, centers, params)
        pts_gt = np.stack([t[0] for t in tracks])
        assert bool(jnp.all(res.success))
        np.testing.assert_allclose(np.asarray(res.point3d), pts_gt, atol=1e-4)

    def test_long_track_consistent_triple_past_index_15(self):
        """Regression: a 24-obs track whose ONLY consistent triple lies past
        index 15 must still triangulate without a PRNG key (the keyless path
        used to truncate sampling to the first 15 observations)."""
        rng = np.random.default_rng(7)
        point, lines, projs, centers = make_track(rng, n_obs=24)
        # Corrupt observations 0..19: random lines through random image
        # points.  (Any 3-line sample triangulates its own 3 observations
        # exactly, so >=4 clean obs are needed for the clean triples to
        # out-vote garbage samples; 6 clean obs, all past index 15.)
        lines = lines.copy()
        for i in range(18):
            hom = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5), 1.0])
            l = np.cross(rng.standard_normal(3), hom)
            lines[i] = l / np.linalg.norm(l[:2])
        params = jnp.broadcast_to(jnp.asarray([500.0, 320.0, 240.0]), (24, 3))
        res = tri_est.estimate_triangulation(
            jnp.asarray(lines), jnp.asarray(projs), jnp.asarray(centers),
            params, jnp.ones(24, bool), "SIMPLE_PINHOLE", 640, 480,
            max_angle_error_rad=np.deg2rad(0.5),
            min_tri_angle_rad=np.deg2rad(1.5))
        assert bool(res.success)
        # A chance-inlier garbage line may join the LO refit; the regression
        # signal is that the clean observations (all past index 15) are the
        # winning support and the point is near ground truth.
        np.testing.assert_allclose(np.asarray(res.point3d), point, atol=0.05)
        mask = np.asarray(res.inlier_mask)
        assert mask[18:].all()

    def test_keyless_combinations_cover_full_pool(self):
        """Deterministic keyless sampling must reach every index of a long
        pool, and stay exhaustive while C(n,3) is cheap."""
        c24 = tri_est._keyless_combinations(24, 512)
        assert c24.shape[0] == 24 * 23 * 22 // 6  # exhaustive
        c64 = tri_est._keyless_combinations(64, 2048)
        assert c64.shape == (2048, 3)
        assert set(np.unique(c64)) == set(range(64))
        # Deterministic across calls.
        np.testing.assert_array_equal(
            c64, tri_est._keyless_combinations.__wrapped__(64, 2048))


class TestEstimateTriangulationBatch:
    """SoA batch solver (solvers/triangulation_batch.py) equivalence."""

    def _batch_inputs(self, tracks, n_obs):
        lines = jnp.asarray(np.stack([t[1] for t in tracks]))
        projs = jnp.asarray(np.stack([t[2] for t in tracks]))
        centers = jnp.asarray(np.stack([t[3] for t in tracks]))
        params = jnp.broadcast_to(jnp.asarray([500.0, 320.0, 240.0]),
                                  (len(tracks), n_obs, 3))
        return lines, projs, centers, params

    def test_matches_per_track_estimator(self):
        from privacy_preserving_sfm_tpu.solvers import (
            triangulation_batch as tri_batch)

        rng = np.random.default_rng(11)
        tracks = [make_track(rng, n_obs=9) for _ in range(12)]
        lines, projs, centers, params = self._batch_inputs(tracks, 9)
        # Corrupt a couple of observations in some tracks.
        lines_np = np.asarray(lines).copy()
        for t in (2, 5, 9):
            bad = rng.standard_normal((2, 3))
            bad /= np.linalg.norm(bad[:, :2], axis=-1, keepdims=True)
            lines_np[t, [1, 6]] = bad
        lines = jnp.asarray(lines_np)
        valid = jnp.ones((12, 9), bool)

        res_b = tri_batch.estimate_triangulation_batch(
            lines, projs, centers, params, valid, "SIMPLE_PINHOLE",
            640, 480, np.deg2rad(2.0), np.deg2rad(1.5))
        f = jax.vmap(lambda l, p, c, cp: tri_est.estimate_triangulation(
            l, p, c, cp, jnp.ones(9, bool), "SIMPLE_PINHOLE", 640, 480,
            np.deg2rad(2.0), np.deg2rad(1.5)))
        res_v = f(lines, projs, centers, params)

        np.testing.assert_array_equal(np.asarray(res_b.success),
                                      np.asarray(res_v.success))
        np.testing.assert_array_equal(np.asarray(res_b.num_inliers),
                                      np.asarray(res_v.num_inliers))
        np.testing.assert_array_equal(np.asarray(res_b.inlier_mask),
                                      np.asarray(res_v.inlier_mask))
        np.testing.assert_allclose(np.asarray(res_b.point3d),
                                   np.asarray(res_v.point3d),
                                   rtol=1e-5, atol=1e-6)
        pts_gt = np.stack([t[0] for t in tracks])
        np.testing.assert_allclose(np.asarray(res_b.point3d), pts_gt,
                                   atol=1e-4)

    def test_pixel_residual_and_padding(self):
        from privacy_preserving_sfm_tpu.solvers import (
            triangulation_batch as tri_batch)

        rng = np.random.default_rng(13)
        tracks = [make_track(rng, n_obs=6) for _ in range(4)]
        lines, projs, centers, params = self._batch_inputs(tracks, 6)
        # Track 3: only 4 valid observations (padding mask).
        valid = np.ones((4, 6), bool)
        valid[3, 4:] = False
        res = tri_batch.estimate_triangulation_batch(
            lines, projs, centers, params, jnp.asarray(valid),
            "SIMPLE_PINHOLE", 640, 480, 4.0, np.deg2rad(1.5),
            residual="pixel")
        assert np.asarray(res.success).all()
        assert not np.asarray(res.inlier_mask)[3, 4:].any()
        pts_gt = np.stack([t[0] for t in tracks])
        np.testing.assert_allclose(np.asarray(res.point3d), pts_gt,
                                   atol=1e-4)
