"""Parity tests: numpy host kernels vs JAX device kernels; GraphView CSR
vs the reference-semantics CorrespondenceGraph."""

import numpy as np
import jax.numpy as jnp
import pytest

from privacy_preserving_sfm_tpu.models.correspondence_graph import (
    CorrespondenceGraph,
)
from privacy_preserving_sfm_tpu.models.graph_view import GraphView
from privacy_preserving_sfm_tpu.ops import lines as line_ops
from privacy_preserving_sfm_tpu.ops import lines_np
from privacy_preserving_sfm_tpu.ops import triangulation as tri_ops


MODELS_PARAMS = {
    "SIMPLE_PINHOLE": [400.0, 320.0, 240.0],
    "PINHOLE": [400.0, 410.0, 320.0, 240.0],
    "SIMPLE_RADIAL": [400.0, 320.0, 240.0, 0.05],
    "OPENCV": [400.0, 410.0, 320.0, 240.0, 0.05, -0.02, 1e-3, -1e-3],
    "OPENCV_FISHEYE": [400.0, 410.0, 320.0, 240.0, 0.03, -0.01, 0.002,
                       -0.001],
    "FOV": [400.0, 410.0, 320.0, 240.0, 0.9],
    "THIN_PRISM_FISHEYE": [400.0, 410.0, 320.0, 240.0, 0.03, -0.01, 1e-3,
                           -1e-3, 0.002, -0.001, 1e-4, -1e-4],
}


@pytest.mark.parametrize("model", sorted(MODELS_PARAMS))
def test_numpy_error_kernels_match_jax(model):
    rng = np.random.default_rng(3)
    n = 64
    params = np.asarray(MODELS_PARAMS[model])
    # Points in front and behind, in and out of image.
    pts = rng.uniform(-2, 2, (n, 3))
    pts[:, 2] = rng.uniform(-1, 8, n)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [w*w + x*x - y*y - z*z, 2*(x*y - w*z), 2*(x*z + w*y)],
        [2*(x*y + w*z), w*w - x*x + y*y - z*z, 2*(y*z - w*x)],
        [2*(x*z - w*y), 2*(y*z + w*x), w*w - x*x - y*y + z*z]])
    proj = np.concatenate([R, rng.uniform(-0.2, 0.2, (3, 1))], axis=1)
    lines = rng.standard_normal((n, 3))
    lines /= np.linalg.norm(lines[:, :2], axis=-1, keepdims=True)

    ref_px = np.asarray(line_ops.squared_line_reprojection_error(
        jnp.asarray(lines), jnp.asarray(pts), jnp.asarray(proj),
        model, jnp.asarray(params), 640, 480))
    got_px = lines_np.squared_line_reprojection_error(
        lines, pts, proj, model, params, 640, 480)
    np.testing.assert_allclose(got_px, ref_px, rtol=1e-9, atol=1e-9)

    ref_ang = np.asarray(line_ops.line_angular_error(
        jnp.asarray(lines), jnp.asarray(pts), jnp.asarray(proj),
        model, jnp.asarray(params), 640, 480))
    got_ang = lines_np.line_angular_error(
        lines, pts, proj, model, params, 640, 480)
    np.testing.assert_allclose(got_ang, ref_ang, rtol=1e-9, atol=1e-9)


def test_numpy_triangulation_angle_matches_jax():
    rng = np.random.default_rng(5)
    c1 = rng.standard_normal((32, 3))
    c2 = rng.standard_normal((32, 3))
    X = rng.standard_normal((32, 3)) * 5
    ref = np.asarray(tri_ops.triangulation_angle(
        jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(X)))
    got = lines_np.triangulation_angle(c1, c2, X)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def _random_matches(rng, n1, n2, k):
    k = min(k, n1, n2)
    i1 = rng.choice(n1, size=k, replace=False)
    i2 = rng.choice(n2, size=k, replace=False)
    return np.stack([i1, i2], axis=1)


def test_graph_view_matches_reference_graph():
    rng = np.random.default_rng(11)
    num_lines = {1: 30, 2: 25, 3: 40, 4: 10}
    graph = CorrespondenceGraph()
    chunks = []
    for a, b in [(1, 2), (1, 3), (2, 3), (3, 4)]:
        m = _random_matches(rng, num_lines[a], num_lines[b], 12)
        graph.add_matches(a, b, m)
        chunks.append((a, b, m))
    graph.finalize()

    for view in (GraphView.from_match_chunks(chunks, num_lines),
                 GraphView.from_graph(graph, num_lines)):
        # Per-feature correspondence sets match.
        for iid in num_lines:
            ro = view.image_row_offsets(iid)
            for li in range(num_lines[iid]):
                a, b = int(ro[li]), int(ro[li + 1])
                got = {(int(view.image_id_arr[view.corr_img_dense[j]]),
                        int(view.corr_line[j])) for j in range(a, b)}
                want = set(graph.find_correspondences(iid, li))
                assert got == want, (iid, li)
            # Two-view flags match.
            flags = view.two_view_flags(iid)
            for li in range(num_lines[iid]):
                assert bool(flags[li]) == \
                    graph.is_two_view_observation(iid, li)
            # num_obs matches finalize() count.
            assert view.num_obs_per_image[iid] == \
                graph.num_observations.get(iid, 0)

        # per_line_counts with an arbitrary mask.
        s, e = view.corr_range(3)
        mask = rng.random(e - s) > 0.5
        counts = view.per_line_counts(3, mask)
        ro = view.image_row_offsets(3)
        for li in range(num_lines[3]):
            assert counts[li] == mask[ro[li] - s:ro[li + 1] - s].sum()


def test_batch_errors_match_scalar():
    from privacy_preserving_sfm_tpu.models.reconstruction import (
        Camera, Image, Reconstruction,
    )

    rng = np.random.default_rng(7)
    rec = Reconstruction()
    rec.add_camera(Camera(1, "SIMPLE_PINHOLE", 640, 480,
                          np.array([400.0, 320.0, 240.0])))
    for iid in (1, 2):
        img = Image(image_id=iid, name=f"i{iid}", camera_id=1)
        lines = rng.standard_normal((20, 3))
        lines /= np.linalg.norm(lines[:, :2], axis=-1, keepdims=True)
        img.lines = lines
        img.aligned = np.zeros(20, bool)
        img.point3d_ids = np.full(20, -1, np.int64)
        img.tvec = rng.uniform(-1, 1, 3)
        rec.add_image(img)
        rec.register_image(iid)
    obs_img = np.array([1, 2, 1, 2, 2])
    obs_li = np.array([0, 3, 7, 1, 19])
    xyz = rng.uniform(-1, 1, (5, 3)) + [0, 0, 5]
    batch = rec.batch_squared_line_errors(obs_img, obs_li, xyz)
    for k in range(5):
        single = rec._squared_line_reproj_error(
            rec.images[int(obs_img[k])], int(obs_li[k]), xyz[k])
        np.testing.assert_allclose(batch[k], single, rtol=1e-12)


def test_batched_complete_and_merge_match_per_point(tmp_path):
    """The vectorized _complete_batch / _merge_batch paths must produce the
    same tracks as the per-point reference implementations (view=None) when
    no claims are contested."""
    import copy

    from privacy_preserving_sfm_tpu.models.database import Database
    from privacy_preserving_sfm_tpu.models.database_cache import DatabaseCache
    from privacy_preserving_sfm_tpu.sfm.incremental_triangulator import (
        IncrementalTriangulator, TriangulatorOptions,
    )
    from tests.test_e2e_synthetic import build_synthetic_db

    rng = np.random.default_rng(3)
    path = str(tmp_path / "db.db")
    qs, ts, pts, image_ids = build_synthetic_db(
        path, rng, num_images=8, num_points=120, drop_prob=0.15)
    with Database(path) as db:
        cache = DatabaseCache.load(db, min_num_matches=15)

    def fresh_rec():
        rec = cache.to_reconstruction()
        for k, iid in enumerate(image_ids):
            img = rec.images[iid]
            img.qvec = np.array(qs[k])
            img.tvec = np.array(ts[k])
            img.point3d_ids = np.full(img.num_lines, -1, np.int64)
            rec.register_image(iid)
        # Points 0..39: partial tracks (first two visible views only) ->
        # complete() must grow them.  Points 60..79: the visible views
        # split into two half-tracks on slightly different points ->
        # merge() must fuse them.
        for j in range(40):
            track = [(iid, j) for iid in image_ids
                     if rec.images[iid].point3d_ids[j] < 0
                     and len(cache.graph.find_correspondences(iid, j)) > 0]
            if len(track) >= 4:
                rec.add_point3d(pts[j], track[:2])
        for j in range(60, 80):
            track = [(iid, j) for iid in image_ids
                     if len(cache.graph.find_correspondences(iid, j)) > 0]
            if len(track) >= 4:
                h = len(track) // 2
                rec.add_point3d(pts[j] + 1e-4, track[:h])
                rec.add_point3d(pts[j] - 1e-4, track[h:])
        return rec

    def track_multiset(rec):
        return sorted(
            tuple(sorted((int(i), int(l)) for i, l in p.track))
            for p in rec.points3d.values())

    opts = TriangulatorOptions()

    # to_reconstruction() shares Image objects across calls (the controller
    # uses one model at a time), so run reference and fast SEQUENTIALLY.
    rec_ref = fresh_rec()
    tri_ref = IncrementalTriangulator(cache.graph, rec_ref, view=None)
    n_ref = tri_ref.complete_all_tracks(opts)
    ref_after_complete = track_multiset(rec_ref)
    m_ref = tri_ref.merge_all_tracks(opts)
    ref_after_merge = track_multiset(rec_ref)

    rec_fast = fresh_rec()
    tri_fast = IncrementalTriangulator(cache.graph, rec_fast,
                                       view=cache.view)
    n_fast = tri_fast.complete_all_tracks(opts)
    assert n_fast == n_ref and n_fast > 0
    assert track_multiset(rec_fast) == ref_after_complete

    m_fast = tri_fast.merge_all_tracks(opts)
    assert m_fast == m_ref and m_fast > 0
    assert track_multiset(rec_fast) == ref_after_merge
