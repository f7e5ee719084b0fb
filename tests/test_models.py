"""Tests for database, correspondence graph, reconstruction data model."""

import os
import tempfile

import numpy as np
import pytest

from privacy_preserving_sfm_tpu.models import (
    Camera, CorrespondenceGraph, Database, Image, Reconstruction,
)
from privacy_preserving_sfm_tpu.models.database import (
    image_pair_to_pair_id, pair_id_to_image_pair,
)
from privacy_preserving_sfm_tpu.models.database_cache import DatabaseCache


class TestDatabase:
    def test_pair_id_roundtrip(self):
        for a, b in [(1, 2), (2, 1), (100, 5), (7, 7)]:
            pid = image_pair_to_pair_id(a, b)
            i1, i2 = pair_id_to_image_pair(pid)
            assert (i1, i2) == (min(a, b), max(a, b))

    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        path = str(tmp_path / "test.db")
        with Database(path) as db:
            cid = db.write_camera("OPENCV", 640, 480,
                                  np.array([500., 500., 320., 240., 0.01,
                                            -0.01, 0.001, 0.002]))
            i1 = db.write_image("a.png", cid)
            i2 = db.write_image("b.png", cid)
            desc = rng.integers(0, 255, (100, 128)).astype(np.uint8)
            db.write_descriptors(i1, desc)
            lines = rng.standard_normal((100, 3))
            lines /= np.linalg.norm(lines[:, :2], axis=-1, keepdims=True)
            aligned = rng.uniform(size=100) < 0.5
            db.write_lines(i1, lines, aligned)
            db.write_gravity(i1, np.array([0.0, 1.0, 0.0]))
            matches = np.stack([np.arange(20), np.arange(20) + 5], 1)
            db.write_matches(i2, i1, matches)  # reversed order on purpose

        with Database(path) as db:
            cams = db.read_cameras()
            assert cams[cid]["model"] == "OPENCV"
            np.testing.assert_allclose(cams[cid]["params"][:2], [500., 500.])
            d = db.read_descriptors(i1)
            np.testing.assert_array_equal(d, desc)
            l, a = db.read_lines(i1)
            np.testing.assert_allclose(l, lines, atol=1e-6)  # f32 blob
            np.testing.assert_array_equal(a, aligned)
            g = db.read_gravity(i1)
            np.testing.assert_allclose(g, [0.0, 1.0, 0.0])
            m12 = db.read_matches(i1, i2)
            # stored swapped; read back in (i1, i2) order
            np.testing.assert_array_equal(m12[:, 0], np.arange(20) + 5)
            np.testing.assert_array_equal(m12[:, 1], np.arange(20))


class TestCorrespondenceGraph:
    def make_graph(self):
        g = CorrespondenceGraph()
        # 3 images; feature 0 of each corresponds.
        g.add_matches(1, 2, np.array([[0, 0], [1, 1]]))
        g.add_matches(2, 3, np.array([[0, 0]]))
        g.finalize()
        return g

    def test_direct_correspondences(self):
        g = self.make_graph()
        assert set(g.find_correspondences(1, 0)) == {(2, 0)}
        assert set(g.find_correspondences(2, 0)) == {(1, 0), (3, 0)}

    def test_transitive(self):
        g = self.make_graph()
        corrs = g.find_transitive_correspondences(1, 0, 2)
        assert set(corrs) == {(2, 0), (3, 0)}

    def test_two_view_track(self):
        g = self.make_graph()
        assert g.is_two_view_observation(1, 1)
        assert not g.is_two_view_observation(1, 0)


def make_simple_rec():
    rec = Reconstruction()
    rec.add_camera(Camera(1, "SIMPLE_PINHOLE", 640, 480,
                          np.array([500., 320., 240.])))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (10, 3)) + np.array([0, 0, 5.0])
    for iid in range(1, 5):
        t = np.array([0.5 * iid, 0.0, 0.0])
        q = np.array([1.0, 0, 0, 0])
        Xc = pts + t
        uv = Xc[:, :2] / Xc[:, 2:3]
        hom = np.concatenate([uv, np.ones((10, 1))], 1)
        dirs = rng.standard_normal((10, 3))
        dirs[::2] = [0.0, 1.0, 0.0]  # half aligned
        lines = np.cross(dirs, hom)
        lines /= np.linalg.norm(lines[:, :2], axis=-1, keepdims=True)
        img = Image(image_id=iid, name=f"im{iid}.png", camera_id=1,
                    qvec=q, tvec=t, gravity=np.array([0.0, 1.0, 0.0]))
        img.lines = lines
        img.aligned = np.asarray([i % 2 == 0 for i in range(10)])
        img.point3d_ids = np.full(10, -1, np.int64)
        rec.add_image(img)
        rec.register_image(iid)
    return rec, pts


class TestReconstruction:
    def test_tracks_and_observations(self):
        rec, pts = make_simple_rec()
        pid = rec.add_point3d(pts[1], [(1, 1), (2, 1), (3, 1)])
        assert rec.images[1].point3d_ids[1] == pid
        assert rec.images[1].num_points3d() == 1
        rec.delete_observation(1, 1)
        assert len(rec.points3d[pid].track) == 2
        rec.delete_observation(2, 1)  # track drops below 2 -> point dies
        assert pid not in rec.points3d
        assert rec.images[3].point3d_ids[1] == -1

    def test_merge(self):
        rec, pts = make_simple_rec()
        p1 = rec.add_point3d(pts[1], [(1, 1), (2, 1)])
        p2 = rec.add_point3d(pts[1] + 0.01, [(3, 1)])
        pm = rec.merge_points3d(p1, p2)
        assert len(rec.points3d[pm].track) == 3
        np.testing.assert_allclose(rec.points3d[pm].xyz,
                                   (2 * pts[1] + (pts[1] + 0.01)) / 3)

    def test_filter_no_random_line(self):
        rec, pts = make_simple_rec()
        # Track on aligned-only observations (line idx 0 is aligned).
        rec.add_point3d(pts[0], [(1, 0), (2, 0), (3, 0)])
        n = rec.filter_points3d_large_reproj_error(4.0,
                                                   set(rec.points3d.keys()))
        assert n == 3 and not rec.points3d

    def test_filter_reproj_error(self):
        rec, pts = make_simple_rec()
        # Good 4-view track on random lines (idx 1).  NOTE: the reference
        # deletes tracks whenever #bad >= len - 3, so even a CLEAN 3-view
        # track dies (3 line constraints have zero redundancy); only
        # tracks with >= 4 surviving observations pass this filter
        # (reconstruction.cc:705-716).
        rec.add_point3d(pts[1], [(1, 1), (2, 1), (3, 1), (4, 1)])
        # Bad track: wrong 3D point.
        rec.add_point3d(pts[3] + 5.0, [(1, 3), (2, 3), (3, 3), (4, 3)])
        n = rec.filter_points3d_large_reproj_error(4.0,
                                                   set(rec.points3d.keys()))
        assert len(rec.points3d) == 1
        assert n == 4

    def test_filter_clean_three_view_track_dies(self):
        rec, pts = make_simple_rec()
        rec.add_point3d(pts[1], [(1, 1), (2, 1), (3, 1)])
        rec.filter_points3d_large_reproj_error(4.0,
                                               set(rec.points3d.keys()))
        assert not rec.points3d  # reference quirk, see note above

    def test_normalize(self):
        rec, pts = make_simple_rec()
        rec.add_point3d(pts[1], [(1, 1), (2, 1), (3, 1)])
        before_err = [rec._squared_line_reproj_error(
            rec.images[i], 1, rec.points3d[1].xyz) for i in (1, 2, 3)]
        rec.normalize(extent=10.0)
        after_err = [rec._squared_line_reproj_error(
            rec.images[i], 1, list(rec.points3d.values())[0].xyz)
            for i in (1, 2, 3)]
        # Similarity transform preserves reprojection errors.
        np.testing.assert_allclose(after_err, before_err, atol=1e-6)

    def test_text_roundtrip(self, tmp_path):
        rec, pts = make_simple_rec()
        rec.add_point3d(pts[1], [(1, 1), (2, 1), (3, 1)])
        rec.points3d[1].error = 0.5
        rec.write_text(str(tmp_path))
        rec2 = Reconstruction.read_text(str(tmp_path))
        assert set(rec2.images) == set(rec.images)
        np.testing.assert_allclose(rec2.images[2].tvec, rec.images[2].tvec)
        np.testing.assert_allclose(rec2.images[2].lines, rec.images[2].lines)
        assert len(rec2.points3d) == 1
        p = list(rec2.points3d.values())[0]
        np.testing.assert_allclose(p.xyz, pts[1])
        assert p.track == [(1, 1), (2, 1), (3, 1)]

    def test_ply(self, tmp_path):
        rec, pts = make_simple_rec()
        rec.add_point3d(pts[1], [(1, 1), (2, 1), (3, 1)])
        path = str(tmp_path / "model.ply")
        rec.write_ply(path)
        content = open(path).read()
        assert "element vertex 1" in content


class TestDatabaseCache:
    def test_load_with_min_matches_and_aligned_only(self, tmp_path):
        rng = np.random.default_rng(1)
        path = str(tmp_path / "c.db")
        with Database(path) as db:
            cid = db.write_camera("SIMPLE_PINHOLE", 640, 480,
                                  np.array([500., 320., 240.]))
            ids = [db.write_image(f"{i}.png", cid) for i in range(3)]
            for iid in ids:
                lines = rng.standard_normal((30, 3))
                lines /= np.linalg.norm(lines[:, :2], axis=-1, keepdims=True)
                aligned = np.arange(30) % 2 == 0
                db.write_lines(iid, lines, aligned)
                db.write_gravity(iid, np.array([0.0, 1.0, 0.0]))
            m = np.stack([np.arange(20), np.arange(20)], 1)
            db.write_matches(ids[0], ids[1], m)
            db.write_matches(ids[1], ids[2], m[:5])  # below min_num_matches

        with Database(path) as db:
            cache = DatabaseCache.load(db, min_num_matches=15)
        assert set(cache.images) == {ids[0], ids[1]}
        assert cache.graph.has_correspondences(ids[0], 0)

        with Database(path) as db:
            cache_al = DatabaseCache.load(db, min_num_matches=15,
                                          aligned_only=True)
        img = cache_al.images[ids[0]]
        assert img.aligned.all() and img.num_lines == 15
        # Matches remapped to aligned-only indexing: even indices 0..18 map
        # to 0..9.
        corrs = cache_al.graph.find_correspondences(ids[0], 0)
        assert corrs == [(ids[1], 0)]


def test_tri_angle_filter_matches_bruteforce():
    """filter_points3d_small_tri_angle (cone test + ambiguous-band
    fallback) must delete exactly the points whose best pairwise folded
    ray angle is below the threshold, per reconstruction.cc:594-654."""
    from privacy_preserving_sfm_tpu.models.reconstruction import (
        Camera, Image, Reconstruction,
    )

    rng = np.random.default_rng(11)
    rec = Reconstruction()
    rec.add_camera(Camera(1, "SIMPLE_PINHOLE", 640, 480,
                          np.array([500., 320., 240.])))
    n_img, n_pts = 30, 200
    centers = np.zeros((n_img, 3))
    # Mixture of baselines: tight cluster (tiny angles), medium, wide.
    centers[:10, 0] = rng.uniform(0, 0.004, 10)       # ~< 0.05 deg at z=5
    centers[10:20, 0] = rng.uniform(0.0, 0.35, 10)    # around threshold
    centers[20:, 0] = rng.uniform(-3.0, 3.0, 10)      # clearly above
    dummy = np.zeros((1, 3))
    for i in range(n_img):
        img = Image(image_id=i + 1, name=f"i{i}.png", camera_id=1,
                    qvec=np.array([1.0, 0, 0, 0]), tvec=-centers[i],
                    gravity=np.array([0.0, 1.0, 0.0]))
        img.lines = np.zeros((n_pts, 3))
        img.lines[:, 0] = 1.0
        img.aligned = np.zeros(n_pts, bool)
        img.point3d_ids = np.full(n_pts, -1, np.int64)
        rec.add_image(img)
        rec.register_image(i + 1)
    pts = rng.uniform(-1, 1, (n_pts, 3)) + np.array([0, 0, 5.0])
    tracks = {}
    for j in range(n_pts):
        k = rng.integers(2, 7)
        grp = rng.choice([0, 1, 2], p=[0.4, 0.4, 0.2])
        lo, hi = (0, 10) if grp == 0 else ((10, 20) if grp == 1 else (0, 30))
        imgs = rng.choice(np.arange(lo, hi), size=min(k, hi - lo),
                          replace=False)
        pid = rec.add_point3d(pts[j], [(int(i) + 1, j) for i in imgs])
        tracks[pid] = imgs

    thr_deg = 1.5
    # Brute force expected survivors.
    expected_dead = set()
    for pid, imgs in tracks.items():
        best = 0.0
        for a in range(len(imgs)):
            for b in range(a + 1, len(imgs)):
                ra = centers[imgs[a]] - rec.points3d[pid].xyz
                rb = centers[imgs[b]] - rec.points3d[pid].xyz
                c = abs(np.dot(ra, rb) /
                        (np.linalg.norm(ra) * np.linalg.norm(rb)))
                best = max(best, np.degrees(np.arccos(min(c, 1.0))))
        if best < thr_deg:
            expected_dead.add(pid)

    n = rec.filter_points3d_small_tri_angle(thr_deg,
                                            set(tracks.keys()))
    assert n == len(expected_dead)
    assert set(tracks.keys()) - set(rec.points3d.keys()) == expected_dead
