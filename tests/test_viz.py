"""Headless model renderer (viz/render.py) + model_viewer CLI."""

import os

import numpy as np

from test_models import make_simple_rec
from privacy_preserving_sfm_tpu.viz import render_model, render_turntable


def _rec_with_points():
    rec, pts = make_simple_rec()
    for j in range(len(pts)):
        rec.add_point3d(pts[j], [(iid, j) for iid in range(1, 5)])
    return rec


def test_render_single_view(tmp_path):
    rec = _rec_with_points()
    out = str(tmp_path / "model.png")
    render_model(rec, out, color_by="track")
    assert os.path.getsize(out) > 1000
    # PNG magic bytes.
    with open(out, "rb") as f:
        assert f.read(4) == b"\x89PNG"


def test_render_color_modes_and_turntable(tmp_path):
    rec = _rec_with_points()
    for mode in ("error", "depth"):
        out = str(tmp_path / f"{mode}.png")
        render_model(rec, out, color_by=mode)
        assert os.path.getsize(out) > 1000
    frames = render_turntable(rec, str(tmp_path / "turn"), num_frames=3)
    assert len(frames) == 3 and all(os.path.getsize(p) > 1000
                                    for p in frames)


def test_model_viewer_cli(tmp_path):
    from privacy_preserving_sfm_tpu.exe.ppsfm import main

    rec = _rec_with_points()
    model_dir = str(tmp_path / "sparse")
    os.makedirs(model_dir)
    rec.write_text(model_dir)
    out = str(tmp_path / "view.png")
    main(["model_viewer", "--input_path", model_dir,
          "--output_path", out, "--color_by", "depth"])
    assert os.path.getsize(out) > 1000


def test_render_empty_model(tmp_path):
    from privacy_preserving_sfm_tpu.models.reconstruction import (
        Reconstruction,
    )

    out = str(tmp_path / "empty.png")
    render_model(Reconstruction(), out, title="empty")
    assert os.path.getsize(out) > 100
