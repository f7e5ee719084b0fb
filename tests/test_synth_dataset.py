"""Synthetic dataset renderer (tools/synth_dataset.py), box scene.

The box scene must produce true-3D views: textured facets over a flat
background with depth compositing, plus the reference-layout sidecars.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

cv2 = pytest.importorskip("cv2")

from tools.synth_dataset import BOX_FACETS, make_dataset  # noqa: E402


def test_box_dataset_renders_and_writes_sidecars(tmp_path):
    out = str(tmp_path / "box")
    make_dataset(out, 3, width=320, height=240, scene="box", seed=7)
    for i in range(3):
        name = f"img{i:03d}.png"
        img = cv2.imread(os.path.join(out, name), cv2.IMREAD_GRAYSCALE)
        assert img is not None and img.shape == (240, 320)
        # Textured facets AND featureless background both visible.
        frac_bg = np.mean(img == 96)
        assert 0.005 < frac_bg < 0.9
        assert img[img != 96].std() > 20  # high-contrast texture
        assert os.path.exists(os.path.join(out, name + ".gravity.txt"))
        assert os.path.exists(
            os.path.join(out, name + ".camera_model.txt"))
    with open(os.path.join(out, "gt_poses.txt")) as f:
        rows = [l for l in f if not l.startswith("#") and l.strip()]
    assert len(rows) == 3


def test_box_views_are_not_homography_related(tmp_path):
    """The point of the box scene: no single homography maps view i to
    view j (the plane scene IS homography-renderable).  Project the facet
    corners of two facets into two GT views and verify the implied
    correspondences are inconsistent with any one homography."""
    from privacy_preserving_sfm_tpu.ops import lie
    import jax.numpy as jnp

    out = str(tmp_path / "box2")
    make_dataset(out, 2, width=320, height=240, scene="box", seed=9)
    poses = []
    with open(os.path.join(out, "gt_poses.txt")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            q = np.array([float(v) for v in parts[1:5]])
            t = np.array([float(v) for v in parts[5:8]])
            poses.append((np.asarray(lie.quat_to_rotmat(jnp.asarray(q))),
                          t))
    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])

    # 3D corner points of every facet (non-coplanar across facets).
    pts = []
    for O, A, B in BOX_FACETS:
        for u, v in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
            pts.append(O + u * A + v * B)
    pts = np.array(pts)

    def project(R, t):
        Xc = pts @ R.T + t
        return Xc[:, :2] / Xc[:, 2:3] * 400.0 + np.array([160.0, 120.0])

    x0, x1 = project(*poses[0]), project(*poses[1])
    # Fit the best homography over all correspondences; residual must be
    # large (a plane scene would fit to sub-pixel).
    Hm, _ = cv2.findHomography(x0.astype(np.float32),
                               x1.astype(np.float32), 0)
    x0h = np.concatenate([x0, np.ones((len(x0), 1))], 1)
    proj = x0h @ Hm.T
    err = np.linalg.norm(proj[:, :2] / proj[:, 2:3] - x1, axis=1)
    assert err.max() > 5.0
