"""End-to-end incremental reconstruction on a synthetic scene.

The full pipeline below the feature extractor: synthetic GT scene ->
privacy line lifting -> SQLite database -> caches -> controller
(init, registration, triangulation, local/global BA) -> pose parity vs GT
up to a similarity gauge (the reference's evaluation protocol:
compare_colmap_poses.m).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from privacy_preserving_sfm_tpu.models.database import Database
from privacy_preserving_sfm_tpu.ops import lie
from privacy_preserving_sfm_tpu.sfm.controller import (
    ControllerOptions, IncrementalMapperController,
)
from privacy_preserving_sfm_tpu.sfm.incremental_mapper import MapperOptions


def build_synthetic_db(path, rng, num_images=8, num_points=120,
                       aligned_ratio=0.5, drop_prob=0.1, prefix="img",
                       center=(0.0, 0.0, 0.0), pixel_noise=0.0,
                       outlier_frac=0.0, lift_focal=None):
    """GT scene -> lifted lines + perfect matches in a SQLite database.

    ``prefix``/``center`` allow writing several disjoint sub-scenes into
    one database (multi-model reconstruction tests); ``pixel_noise``
    perturbs the lifted point by N(0, px) pixels before the line is drawn
    through it; ``outlier_frac`` corrupts that fraction of matches.
    ``lift_focal``: lift the lines (and write the camera) with this WRONG
    focal instead of the true 500 — the uncalibrated regime (the DB
    camera gets prior_focal_length=False)."""
    # Cameras on an arc looking at the cloud.
    qs, ts = [], []
    for i in range(num_images):
        yaw = -0.35 + 0.7 * i / max(1, num_images - 1)
        q_yaw = np.array([np.cos(yaw / 2), 0, np.sin(yaw / 2), 0])
        ax = rng.standard_normal(3) * 0.05
        ang = np.linalg.norm(ax) + 1e-12
        q_tilt = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * ax / ang])
        q = np.asarray(lie.quat_multiply(jnp.asarray(q_tilt),
                                         jnp.asarray(q_yaw)))
        t = np.array([-1.0 + 2.0 * i / max(1, num_images - 1),
                      rng.uniform(-0.1, 0.1), rng.uniform(-0.2, 0.2)]) \
            - np.asarray(lie.quat_to_rotmat(jnp.asarray(q))) @ \
            np.asarray(center, float)
        qs.append(q)
        ts.append(t)
    qs, ts = np.stack(qs), np.stack(ts)
    pts = rng.uniform(-1.5, 1.5, (num_points, 3))
    pts[:, 2] = np.abs(pts[:, 2]) + 3.0
    pts += np.asarray(center)
    # Per-POINT aligned split (like the reference test fixture
    # setup_random_lines): an aligned track is aligned in every view.
    aligned = rng.uniform(size=num_points) < aligned_ratio

    with Database(path) as db:
        cam_id = db.write_camera(
            "SIMPLE_PINHOLE", 640, 480,
            np.array([lift_focal or 500.0, 320.0, 240.0]),
            prior_focal=lift_focal is None)
        image_ids = []
        visible = []
        for i in range(num_images):
            iid = db.write_image(f"{prefix}{i:03d}.png", cam_id)
            image_ids.append(iid)
            R = np.asarray(lie.quat_to_rotmat(jnp.asarray(qs[i])))
            Xc = pts @ R.T + ts[i]
            uv = Xc[:, :2] / Xc[:, 2:3]
            pix = uv * 500.0 + np.array([320.0, 240.0])
            vis = ((Xc[:, 2] > 0.2) & (pix[:, 0] >= 0) & (pix[:, 0] < 640)
                   & (pix[:, 1] >= 0) & (pix[:, 1] < 480)
                   & (rng.uniform(size=num_points) > drop_prob))
            visible.append(vis)
            g = R @ np.array([0.0, 1.0, 0.0])
            uv_n = uv + rng.normal(0, pixel_noise / 500.0,
                                   uv.shape) if pixel_noise else uv
            if lift_focal:
                # Mis-lift: pixels were formed with f=500 but the lift
                # normalizes with lift_focal.
                uv_n = uv_n * (500.0 / lift_focal)
            hom = np.concatenate([uv_n, np.ones((num_points, 1))], axis=1)
            dirs = np.where(aligned[:, None],
                            np.broadcast_to(g, (num_points, 3)),
                            rng.standard_normal((num_points, 3)))
            lines = np.cross(dirs, hom)
            lines /= np.linalg.norm(lines[:, :2], axis=-1, keepdims=True)
            # Feature j of this image <-> global point j (dense indexing;
            # invisible features keep garbage lines but never match).
            lines[~vis] = rng.standard_normal((int((~vis).sum()), 3))
            lines[~vis] /= np.linalg.norm(lines[~vis, :2], axis=-1,
                                          keepdims=True)
            db.write_lines(iid, lines, aligned)
            db.write_gravity(iid, g)
        for a in range(num_images):
            for b in range(a + 1, num_images):
                both = np.nonzero(visible[a] & visible[b])[0]
                m = np.stack([both, both], axis=1).astype(np.uint32)
                if outlier_frac and len(m):
                    bad = rng.uniform(size=len(m)) < outlier_frac
                    m[bad, 1] = rng.integers(0, num_points, int(bad.sum()))
                    # Drop accidental duplicates in the second column.
                    _, keep = np.unique(m[:, 1], return_index=True)
                    m = m[np.sort(keep)]
                db.write_matches(image_ids[a], image_ids[b], m)
    return qs, ts, pts, image_ids


def similarity_align(src: np.ndarray, dst: np.ndarray):
    """Umeyama similarity alignment src -> dst; returns (s, R, t)."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    cs = src - mu_s
    cd = dst - mu_d
    cov = cd.T @ cs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var = (cs ** 2).sum() / len(src)
    s = np.trace(np.diag(D) @ S) / var
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(rec, qs, ts, image_ids):
    """Absolute trajectory error after similarity alignment."""
    gt_centers, est_centers, rot_errs = [], [], []
    for i, iid in enumerate(image_ids):
        img = rec.images.get(iid)
        if img is None or not img.registered:
            continue
        gt_centers.append(np.asarray(lie.projection_center(
            jnp.asarray(qs[i]), jnp.asarray(ts[i]))))
        est_centers.append(img.projection_center())
    gt_centers = np.stack(gt_centers)
    est_centers = np.stack(est_centers)
    s, R, t = similarity_align(est_centers, gt_centers)
    aligned = (s * (R @ est_centers.T)).T + t
    return float(np.sqrt(((aligned - gt_centers) ** 2).sum(-1).mean()))


FAST = ControllerOptions(
    min_model_size=4,
    mapper=MapperOptions(num_hypotheses=512, init_num_samples=256,
                         abs_pose_min_num_inliers=15),
    verbose=False,
)


class TestEndToEnd:
    @pytest.mark.slow
    def test_full_pipeline_clean(self, tmp_path):
        rng = np.random.default_rng(0)
        path = str(tmp_path / "scene.db")
        qs, ts, pts, image_ids = build_synthetic_db(path, rng)
        ctrl = IncrementalMapperController(FAST, database_path=path)
        recs = ctrl.run()
        assert recs, "no reconstruction produced"
        rec = max(recs, key=lambda r: r.num_registered())
        assert rec.num_registered() >= 7, (
            f"only {rec.num_registered()}/8 registered")
        assert len(rec.points3d) >= 40, f"only {len(rec.points3d)} points"
        err = ate_rmse(rec, qs, ts, image_ids)
        # Scene extent ~10 after Normalize; demand sub-1% ATE.
        assert err < 0.05, f"ATE {err}"
        mean_err = rec.compute_mean_reprojection_error()
        assert mean_err < 1.0, f"mean reproj {mean_err}px"


    @pytest.mark.slow
    def test_full_pipeline_noisy_with_outliers(self, tmp_path):
        """Line noise + wrong matches (VERDICT r1: clean-only e2e).

        1 px of point noise under the lifted lines and 15 % corrupted
        matches; tolerances follow the reference defaults (4 px filter,
        2 deg triangulation gates)."""
        rng = np.random.default_rng(3)
        path = str(tmp_path / "noisy.db")
        qs, ts, pts, image_ids = build_synthetic_db(
            path, rng, pixel_noise=1.0, outlier_frac=0.15)
        ctrl = IncrementalMapperController(FAST, database_path=path)
        recs = ctrl.run()
        assert recs, "no reconstruction produced"
        rec = max(recs, key=lambda r: r.num_registered())
        assert rec.num_registered() >= 6, (
            f"only {rec.num_registered()}/8 registered")
        err = ate_rmse(rec, qs, ts, image_ids)
        # Scene extent ~10 (post-Normalize); 1 px noise at f=500 over an
        # 8-image arc yields a few percent ATE — gate at 3.5 %.
        assert err < 0.35, f"ATE {err}"
        mean_err = rec.compute_mean_reprojection_error()
        assert mean_err < 2.5, f"mean reproj {mean_err}px"

    @pytest.mark.slow
    def test_two_disjoint_scenes_two_models(self, tmp_path):
        """Two unconnected sub-scenes in one DB -> two models with zero
        shared images (multiple_models + max_model_overlap bookkeeping,
        ``controllers/incremental_mapper.cc:382-591``)."""
        rng = np.random.default_rng(1)
        path = str(tmp_path / "two.db")
        _, _, _, ids_a = build_synthetic_db(path, rng, prefix="a")
        _, _, _, ids_b = build_synthetic_db(path, rng, prefix="b",
                                            center=(40.0, 0.0, 0.0))
        ctrl = IncrementalMapperController(FAST, database_path=path)
        recs = ctrl.run()
        assert len(recs) == 2, f"expected 2 models, got {len(recs)}"
        reg_sets = [
            {rec.images[iid].name for iid in rec.reg_image_ids}
            for rec in recs]
        # Each model covers one cluster; no image in both.
        assert not (reg_sets[0] & reg_sets[1])
        prefixes = [{n[0] for n in s} for s in reg_sets]
        assert prefixes[0] != prefixes[1]
        assert all(len(s) >= 6 for s in reg_sets), reg_sets


class TestUncalibrated:
    @pytest.mark.slow
    def test_wrong_focal_refined(self, tmp_path):
        """Lines lifted with a 12%-wrong heuristic focal; the variable-
        intrinsics BA (+ focal search at registration) must converge to
        within 2x the calibrated-run ATE and recover the true focal.

        Reference regime: ``bundle_adjustment.cc:490-528`` intrinsics
        subsets + the (dead-in-the-fork) focal sampling of
        ``incremental_mapper.cc:660-714``, reformulated for lifted lines
        (optim/ba_intrinsics.py docstring)."""
        import dataclasses as _dc

        rng = np.random.default_rng(7)
        path = str(tmp_path / "uncal.db")
        qs, ts, pts, image_ids = build_synthetic_db(path, rng,
                                                    lift_focal=560.0)
        opts = _dc.replace(FAST, ba_refine_focal_length=True)
        ctrl = IncrementalMapperController(opts, database_path=path)
        recs = ctrl.run()
        assert recs, "no reconstruction produced"
        rec = max(recs, key=lambda r: r.num_registered())
        assert rec.num_registered() >= 6, (
            f"only {rec.num_registered()}/8 registered")
        err = ate_rmse(rec, qs, ts, image_ids)
        assert err < 0.10, f"ATE {err} (calibrated clean gate is 0.05)"
        cam = next(iter(rec.cameras.values()))
        # True focal is 500; the lift claimed 560.
        assert abs(cam.params[0] - 500.0) < 15.0, cam.params
