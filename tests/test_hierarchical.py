"""Block-parallel hierarchical mapper (sfm/hierarchical.py).

Partition a 16-image synthetic arc into two overlapping blocks,
reconstruct each independently, chain-merge via Umeyama on the shared
anchors, and jointly refine — the merged model must register everything
and match ground truth at the same accuracy as the sequential mapper.
"""

import numpy as np
import pytest

from privacy_preserving_sfm_tpu.sfm.hierarchical import (
    HierarchicalOptions, hierarchical_map, merge_into, partition_sequential,
    snapshot_model, umeyama,
)

from test_e2e_synthetic import FAST, ate_rmse, build_synthetic_db


def test_partition_sequential():
    names = [f"i{k:02d}" for k in range(23)]
    blocks = partition_sequential(names, 10, 3)
    assert blocks[0] == names[:10]
    assert blocks[1][:3] == names[7:10]  # overlap anchors
    assert blocks[-1][-1] == names[-1]
    covered = set()
    for b in blocks:
        covered.update(b)
    assert covered == set(names)
    with pytest.raises(ValueError):
        partition_sequential(names, 3, 3)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((20, 3))
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    s, t = 2.3, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    s_e, R_e, t_e = umeyama(src, dst)
    assert abs(s_e - s) < 1e-9
    np.testing.assert_allclose(R_e, R, atol=1e-9)
    np.testing.assert_allclose(t_e, t, atol=1e-9)


@pytest.mark.slow
def test_hierarchical_two_blocks(tmp_path):
    rng = np.random.default_rng(3)
    path = str(tmp_path / "scene.db")
    qs, ts, pts, image_ids = build_synthetic_db(
        path, rng, num_images=16, num_points=200, drop_prob=0.08)
    opts = HierarchicalOptions(block_size=10, overlap=4, num_workers=1,
                               controller=FAST)
    rec = hierarchical_map(path, opts, verbose=False)
    assert rec is not None
    assert rec.num_registered() >= 15, (
        f"only {rec.num_registered()}/16 registered")
    err = ate_rmse(rec, qs, ts, image_ids)
    assert err < 0.05, f"ATE {err}"
    assert rec.compute_mean_reprojection_error() < 1.0


@pytest.mark.slow
def test_hierarchical_parallel_workers(tmp_path):
    """The multiprocessing path (spawned workers) produces the same kind
    of model as in-process blocks; workers must be pinned to CPU since
    the parent's jax.config does not propagate to spawned children."""
    rng = np.random.default_rng(7)
    path = str(tmp_path / "scene.db")
    qs, ts, pts, image_ids = build_synthetic_db(
        path, rng, num_images=12, num_points=150)
    opts = HierarchicalOptions(block_size=8, overlap=4, num_workers=2,
                               controller=FAST)
    rec = hierarchical_map(path, opts, platform="cpu", verbose=False)
    assert rec is not None
    assert rec.num_registered() >= 11
    assert ate_rmse(rec, qs, ts, image_ids) < 0.05


def test_merge_into_anchors_and_tracks(tmp_path):
    """Unit-level merge: two copies of one reconstruction in different
    gauges must merge into one model with unified tracks."""
    rng = np.random.default_rng(5)
    path = str(tmp_path / "scene.db")
    build_synthetic_db(path, rng, num_images=8, num_points=100)

    from privacy_preserving_sfm_tpu.models.database import Database
    from privacy_preserving_sfm_tpu.models.database_cache import DatabaseCache
    from privacy_preserving_sfm_tpu.sfm.controller import (
        IncrementalMapperController,
    )

    ctrl = IncrementalMapperController(FAST, database_path=path)
    recs = ctrl.run()
    assert recs
    rec = max(recs, key=lambda r: r.num_registered())
    snap_a = snapshot_model(rec)
    # Second snapshot in a rotated/scaled/shifted gauge.
    ang = 0.4
    R = np.array([[1.0, 0, 0],
                  [0, np.cos(ang), -np.sin(ang)],
                  [0, np.sin(ang), np.cos(ang)]])
    rec.transform(1.7, R, np.array([3.0, -1.0, 2.0]))
    snap_b = snapshot_model(rec)

    with Database(path) as db:
        cache = DatabaseCache.load(db, 15)
    merged = cache.to_reconstruction()
    for img in merged.images.values():
        img.registered = False
        img.point3d_ids = np.full(img.num_lines, -1, np.int64)
    merged.reg_image_ids = []

    assert merge_into(merged, snap_a)
    n_reg, n_pts = merged.num_registered(), len(merged.points3d)
    assert n_reg == rec.num_registered()
    # Merging the SAME model from another gauge must not add anything.
    assert merge_into(merged, snap_b)
    assert merged.num_registered() == n_reg
    assert len(merged.points3d) == n_pts
    # Every track observation stayed consistent.
    for pid, pt in merged.points3d.items():
        for iid, li in pt.track:
            assert merged.images[iid].point3d_ids[li] == pid
