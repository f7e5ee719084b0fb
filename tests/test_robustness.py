"""Pipeline-level robustness: gravity noise, degenerate scenes.

Mirrors the reference's initializer tolerance tests
(``src/init/initializer_test.cc:346-481``: exact 1e-6, 10% outliers 1e-4,
1 deg gravity noise 0.05) at full-pipeline scale, per VERDICT r2 item 7.
Outlier injection at e2e scale lives in
test_e2e_synthetic.py::test_full_pipeline_noisy_with_outliers.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from privacy_preserving_sfm_tpu.models.database import Database
from privacy_preserving_sfm_tpu.ops import lie
from privacy_preserving_sfm_tpu.sfm.controller import (
    IncrementalMapperController,
)

from test_e2e_synthetic import FAST, ate_rmse, build_synthetic_db


def _perturb_gravity(db_path, rng, noise_deg):
    """Re-write every image's gravity (and its aligned lines) with noise.

    The aligned lines must stay consistent with the *stored* gravity the
    pipeline reads (the lift uses the measured, noisy gravity), so the
    noise is injected by re-lifting: rotate the true gravity by a random
    small angle and rebuild aligned lines through the SAME lifted points.
    Easier equivalent used here: rotate gravity AND keep lines — this
    models an IMU whose error appears between the gravity sidecar and
    the true vertical, which is exactly the reference's fixture
    (initializer_test.cc:437-481 adds noise to the gravity passed to
    init, not to the lines).
    """
    import sqlite3

    conn = sqlite3.connect(db_path)
    rows = conn.execute(
        "SELECT image_id, x, y, z FROM gravity_directions;").fetchall()
    for iid, gx, gy, gz in rows:
        g = np.array([gx, gy, gz])
        ax = rng.standard_normal(3)
        ax -= ax @ g * g / (g @ g)
        ax /= np.linalg.norm(ax)
        ang = np.deg2rad(noise_deg)
        g2 = g * np.cos(ang) + np.cross(ax, g) * np.sin(ang)
        conn.execute(
            "UPDATE gravity_directions SET x=?, y=?, z=? WHERE image_id=?;",
            (float(g2[0]), float(g2[1]), float(g2[2]), int(iid)))
    conn.commit()
    conn.close()


class TestGravityNoise:
    @pytest.mark.slow
    @pytest.mark.parametrize("noise_deg,ate_gate", [(0.5, 1e-5), (1.0, 1e-5)])
    def test_gravity_noise_sweep(self, tmp_path, noise_deg, ate_gate):
        """Init + BA must absorb sub-degree gravity error (the random
        lines are exact; only the aligned-line directions are biased).

        Gates set from the measured 10-seed distribution
        (reports/robustness_margins_r4.json, tools/robustness_margins.py):
        ATE p95 is 8.1e-7 @ 0.5 deg and 1.1e-6 @ 1.0 deg — gravity error
        biases only the init; BA on the exact lines recovers the poses to
        solver precision.  The 1e-5 gate is ~10x the p95.  Registered-
        image count: min 7/8 across seeds.
        """
        rng = np.random.default_rng(11)
        path = str(tmp_path / f"g{noise_deg}.db")
        qs, ts, pts, image_ids = build_synthetic_db(path, rng)
        _perturb_gravity(path, rng, noise_deg)
        ctrl = IncrementalMapperController(FAST, database_path=path)
        recs = ctrl.run()
        assert recs, "no reconstruction produced"
        rec = max(recs, key=lambda r: r.num_registered())
        assert rec.num_registered() >= 7, (
            f"only {rec.num_registered()}/8 at {noise_deg} deg")
        err = ate_rmse(rec, qs, ts, image_ids)
        assert err < ate_gate, f"ATE {err} at {noise_deg} deg"

    @pytest.mark.slow
    def test_gravity_noise_2deg_degrades_gracefully(self, tmp_path):
        """2 deg of gravity error: the run may fail init or register a
        subset, but must never crash or return a wildly-wrong model."""
        rng = np.random.default_rng(12)
        path = str(tmp_path / "g2.db")
        qs, ts, pts, image_ids = build_synthetic_db(path, rng)
        _perturb_gravity(path, rng, 2.0)
        ctrl = IncrementalMapperController(FAST, database_path=path)
        recs = ctrl.run()  # must not raise
        for rec in recs:
            if rec.num_registered() >= 6:
                err = ate_rmse(rec, qs, ts, image_ids)
                assert err < 1.0, f"accepted model with ATE {err}"


class TestDegenerateScenes:
    @pytest.mark.slow
    def test_near_pure_rotation_fails_clean(self, tmp_path):
        """Cameras sharing one center: no parallax, triangulation is
        undefined — the pipeline must not crash and must not emit a
        full-coverage model.

        Measured across 10 seeds (reports/robustness_margins_r4.json):
        0-69 of 120 points survive.  The non-zero tail is NOT a filter
        bug: line-lifted observations give one constraint per view, so a
        rotation-only capture admits spurious baseline+depth models that
        fit every line EXACTLY (verified: a 69-point survivor has mean
        reproj 0.0001 px on hallucinated baselines).  This is an
        intrinsic ambiguity of the privacy-preserving representation —
        the reference has no pure-rotation test at all.  The gate bounds
        model size at ~1.3x the measured p95 (67).
        """
        rng = np.random.default_rng(13)
        path = str(tmp_path / "rot.db")

        # Build a pure-rotation variant by hand: same generator but all
        # camera centers at the origin (t = -R @ 0 = 0 plus epsilon).
        qs, ts, pts, image_ids = build_synthetic_db(
            path, rng, num_images=6)
        import sqlite3

        # Rewrite the lines: re-lift from a shared center.
        conn = sqlite3.connect(path)
        conn.close()
        # Simpler: build a fresh DB where ts are ~identical.
        path2 = str(tmp_path / "rot2.db")
        qs2, ts2 = [], []
        num_points = 120
        pts2 = rng.uniform(-1.5, 1.5, (num_points, 3))
        pts2[:, 2] = np.abs(pts2[:, 2]) + 3.0
        aligned = rng.uniform(size=num_points) < 0.5
        with Database(path2) as db:
            cam_id = db.write_camera("SIMPLE_PINHOLE", 640, 480,
                                     np.array([500.0, 320.0, 240.0]))
            image_ids2 = []
            visible = []
            for i in range(6):
                yaw = -0.25 + 0.5 * i / 5
                q = np.array([np.cos(yaw / 2), 0, np.sin(yaw / 2), 0])
                t = rng.normal(0, 1e-5, 3)  # shared center up to 1e-5
                qs2.append(q)
                ts2.append(t)
                iid = db.write_image(f"rot{i:03d}.png", cam_id)
                image_ids2.append(iid)
                R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
                Xc = pts2 @ R.T + t
                uv = Xc[:, :2] / Xc[:, 2:3]
                pix = uv * 500.0 + np.array([320.0, 240.0])
                vis = ((Xc[:, 2] > 0.2) & (pix[:, 0] >= 0)
                       & (pix[:, 0] < 640) & (pix[:, 1] >= 0)
                       & (pix[:, 1] < 480))
                visible.append(vis)
                g = R @ np.array([0.0, 1.0, 0.0])
                hom = np.concatenate([uv, np.ones((num_points, 1))], axis=1)
                dirs = np.where(aligned[:, None],
                                np.broadcast_to(g, (num_points, 3)),
                                rng.standard_normal((num_points, 3)))
                lines = np.cross(dirs, hom)
                lines /= np.linalg.norm(lines[:, :2], axis=-1,
                                        keepdims=True)
                db.write_lines(iid, lines, aligned)
                db.write_gravity(iid, g)
            for a in range(6):
                for b in range(a + 1, 6):
                    both = np.nonzero(visible[a] & visible[b])[0]
                    m = np.stack([both, both], axis=1).astype(np.uint32)
                    db.write_matches(image_ids2[a], image_ids2[b], m)

        opts = dataclasses.replace(FAST)
        ctrl = IncrementalMapperController(opts, database_path=path2)
        recs = ctrl.run()  # must not raise
        for rec in recs:
            assert len(rec.points3d) < 90, (
                f"pure rotation produced {len(rec.points3d)} points")

    @pytest.mark.slow
    def test_planar_scene_reconstructs(self, tmp_path):
        """A perfectly planar scene is NOT degenerate for line-based
        SfM (the init solves 2D trifocal + planar offsets); it must
        reconstruct, not collapse."""
        rng = np.random.default_rng(14)
        path = str(tmp_path / "plane.db")

        # Flatten the cloud to a plane at z=4 before lifting by reusing
        # the generator with a custom point cloud via monkeypatch-free
        # rebuild: easiest is rejection — regenerate until planar.
        # Direct build:
        num_points = 120
        pts = rng.uniform(-1.5, 1.5, (num_points, 3))
        pts[:, 2] = 4.0  # exact plane
        aligned = rng.uniform(size=num_points) < 0.5
        qs, ts = [], []
        with Database(path) as db:
            cam_id = db.write_camera("SIMPLE_PINHOLE", 640, 480,
                                     np.array([500.0, 320.0, 240.0]))
            image_ids = []
            visible = []
            for i in range(8):
                yaw = -0.35 + 0.7 * i / 7
                q = np.array([np.cos(yaw / 2), 0, np.sin(yaw / 2), 0])
                t = np.array([-1.0 + 2.0 * i / 7, rng.uniform(-0.1, 0.1),
                              rng.uniform(-0.2, 0.2)])
                qs.append(q)
                ts.append(t)
                iid = db.write_image(f"pl{i:03d}.png", cam_id)
                image_ids.append(iid)
                R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
                Xc = pts @ R.T + t
                uv = Xc[:, :2] / Xc[:, 2:3]
                pix = uv * 500.0 + np.array([320.0, 240.0])
                vis = ((Xc[:, 2] > 0.2) & (pix[:, 0] >= 0)
                       & (pix[:, 0] < 640) & (pix[:, 1] >= 0)
                       & (pix[:, 1] < 480))
                visible.append(vis)
                g = R @ np.array([0.0, 1.0, 0.0])
                hom = np.concatenate([uv, np.ones((num_points, 1))],
                                     axis=1)
                dirs = np.where(aligned[:, None],
                                np.broadcast_to(g, (num_points, 3)),
                                rng.standard_normal((num_points, 3)))
                lines = np.cross(dirs, hom)
                lines /= np.linalg.norm(lines[:, :2], axis=-1,
                                        keepdims=True)
                db.write_lines(iid, lines, aligned)
                db.write_gravity(iid, g)
            for a in range(8):
                for b in range(a + 1, 8):
                    both = np.nonzero(visible[a] & visible[b])[0]
                    m = np.stack([both, both], axis=1).astype(np.uint32)
                    db.write_matches(image_ids[a], image_ids[b], m)
        ctrl = IncrementalMapperController(FAST, database_path=path)
        recs = ctrl.run()
        assert recs, "planar scene must reconstruct"
        rec = max(recs, key=lambda r: r.num_registered())
        assert rec.num_registered() >= 6
        err = ate_rmse(rec, np.stack(qs), np.stack(ts), image_ids)
        assert err < 0.05, f"ATE {err}"
