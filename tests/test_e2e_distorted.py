"""Pixels-to-model e2e through a REAL lens model (OPENCV).

The dataset is rendered through barrel+tangential distortion (~76 px max
corner displacement), so the pipeline must undistort during line lifting
(``image_to_world`` Newton inversion) and re-distort inside every
projection/BA residual (the distort-both-points semantics of
``projection.cc:162-203``).  A pinhole-assuming pipeline fails this scene
by tens of pixels at the image borders.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_opencv_distorted_pixels_to_model(tmp_path):
    from tools.evaluate import evaluate, read_gt_poses, read_model_poses
    from tools.synth_dataset import make_dataset

    data = str(tmp_path / "data")
    ws = str(tmp_path / "ws")
    make_dataset(data, 8, scene="box", camera="OPENCV", seed=4)

    from privacy_preserving_sfm_tpu.exe.ppsfm import main
    main(["automatic_reconstructor", "--workspace_path", ws,
          "--image_path", data])

    model_dir = os.path.join(ws, "sparse", "0")
    assert os.path.isdir(model_dir), "no model produced"
    _, est = read_model_poses(model_dir)
    gt = read_gt_poses(os.path.join(data, "gt_poses.txt"))
    rep = evaluate(est, gt)
    assert rep["num_registered"] >= 7, rep
    assert rep["ate_rmse"] < 0.02, rep
    assert rep["mean_rot_deg"] < 0.5, rep
