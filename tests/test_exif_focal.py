"""EXIF focal-length cascade (features/exif_focal.py).

Mirrors the reference's Bitmap::ExifFocalLength behavior
(/root/reference/src/util/bitmap.cc:286-370): 35mm-equivalent first,
then focal-mm + sensor-width lookup, then the 1.2*max(W,H) heuristic
with prior_focal=False.
"""

import numpy as np
import pytest

from privacy_preserving_sfm_tpu.features.exif_focal import (
    DEFAULT_FOCAL_LENGTH_FACTOR, exif_focal_length, query_sensor_width)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402
from PIL.ExifTags import IFD  # noqa: E402


def _write_jpeg(path, exif_tags, size=(640, 480)):
    im = Image.fromarray(np.zeros((size[1], size[0]), np.uint8))
    exif = Image.Exif()
    for tag, value in exif_tags.items():
        # Make/Model (271/272) live in IFD0; the rest in the Exif IFD.
        if tag in (271, 272):
            exif[tag] = value
        else:
            exif.get_ifd(IFD.Exif)[tag] = value
    im.save(path, exif=exif)


def test_focal_35mm_equivalent(tmp_path):
    p = str(tmp_path / "a.jpg")
    _write_jpeg(p, {41989: 50})  # FocalLengthIn35mmFilm
    f, prior = exif_focal_length(p, 640, 480)
    assert prior
    assert f == pytest.approx(50 / 35.0 * 640)


def test_focal_mm_with_sensor_db(tmp_path):
    p = str(tmp_path / "b.jpg")
    _write_jpeg(p, {37386: 24.0, 271: "Canon", 272: "Canon EOS 5D Mark IV"})
    f, prior = exif_focal_length(p, 640, 480)
    assert prior
    assert f == pytest.approx(24.0 / 36.0 * 640)


def test_fallback_heuristic(tmp_path):
    p = str(tmp_path / "c.jpg")
    _write_jpeg(p, {})
    f, prior = exif_focal_length(p, 640, 480)
    assert not prior
    assert f == pytest.approx(DEFAULT_FOCAL_LENGTH_FACTOR * 640)


def test_missing_file_falls_back():
    f, prior = exif_focal_length("/nonexistent/x.jpg", 800, 600)
    assert not prior
    assert f == pytest.approx(DEFAULT_FOCAL_LENGTH_FACTOR * 800)


def test_sensor_width_specificity():
    # More specific entries win over family fallbacks.  (The original
    # EOS 5D sensor is 35.8 x 23.9 mm; the Mark II+ bodies are 36.0.)
    assert query_sensor_width("Canon", "Canon EOS 5D") == 35.8
    assert query_sensor_width("Canon", "Canon EOS 80D") == 22.3
    assert query_sensor_width("Apple", "iPhone 13 Pro") == 9.5
    assert query_sensor_width("Unknown", "CamCorder 9000") is None


def test_extractor_cli_uses_exif_when_no_calib(tmp_path):
    """feature_extractor without .camera_model.txt guesses focal from
    EXIF and records prior_focal in the DB (image_reader.cc:117-139)."""
    from privacy_preserving_sfm_tpu.exe.ppsfm import main
    from privacy_preserving_sfm_tpu.models.database import Database

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    arr = (rng.random((120, 160)) * 255).astype(np.uint8)
    im = Image.fromarray(arr)
    exif = Image.Exif()
    exif.get_ifd(IFD.Exif)[41989] = 35  # f35 == 35mm -> f_px = max(W,H)
    im.save(str(img_dir / "x.jpg"), exif=exif)
    with open(str(img_dir / "x.jpg.gravity.txt"), "w") as fh:
        fh.write("0 -1 0\n")

    db_path = str(tmp_path / "db.db")
    main(["feature_extractor", "--database_path", db_path,
          "--image_path", str(img_dir), "--max_num_features", "64"])

    db = Database(db_path)
    cams = db.read_cameras()
    assert len(cams) == 1
    cam = next(iter(cams.values()))
    assert cam["prior_focal_length"]
    assert cam["params"][0] == pytest.approx(160.0)
    db.close()
