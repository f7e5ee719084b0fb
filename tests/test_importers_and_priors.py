"""EXIF/GPS priors, per-image masks, raw feature-pair import (CLI level).

Covers ``image_reader.cc:42-50,252-259`` (masks + GPS priors) and
``matching.cc:995-1087`` (FeaturePairsFeatureMatcher) equivalents.
"""

import os

import numpy as np
import pytest

from privacy_preserving_sfm_tpu.exe.ppsfm import main as ppsfm_main
from privacy_preserving_sfm_tpu.models.database import Database


def _write_image_set(d, rng, num=3):
    from PIL import Image

    names = []
    for i in range(num):
        name = f"im{i}.png"
        arr = (rng.uniform(0, 255, (96, 96))).astype(np.uint8)
        Image.fromarray(arr, "L").save(os.path.join(d, name))
        with open(os.path.join(d, name + ".gravity.txt"), "w") as f:
            f.write("0 1 0\n")
        with open(os.path.join(d, name + ".camera_model.txt"), "w") as f:
            f.write("SIMPLE_PINHOLE, 80, 48, 48\n")
        # GPS sidecar: ~11m east per index at the equator.
        with open(os.path.join(d, name + ".gps.txt"), "w") as f:
            f.write(f"0.0 {i * 1e-4} 10.0\n")
        names.append(name)
    return names


def test_gps_priors_and_mask(tmp_path):
    rng = np.random.default_rng(0)
    d = str(tmp_path)
    names = _write_image_set(d, rng)

    # Mask image 0 fully -> zero features for it.
    from PIL import Image

    Image.fromarray(np.zeros((96, 96), np.uint8), "L").save(
        os.path.join(d, names[0] + ".mask.png"))

    db_path = os.path.join(d, "db.db")
    ppsfm_main(["feature_extractor", "--database_path", db_path,
                "--image_path", d, "--max_num_features", "128"])

    with Database(db_path) as db:
        images = db.read_images()
        by_name = {}
        rows = db.conn.execute(
            "SELECT image_id, name, prior_tx, prior_ty, prior_tz"
            " FROM images;").fetchall()
        for iid, name, tx, ty, tz in rows:
            by_name[name] = (iid, tx, ty, tz)
        # GPS priors stored as raw (lat, lon, alt).
        assert by_name[names[1]][1:] == (0.0, 1e-4, 10.0)
        # Fully-masked image has no features.
        lines0, _ = db.read_lines(by_name[names[0]][0])
        lines1, _ = db.read_lines(by_name[names[1]][0])
        assert len(lines0) == 0
        assert len(lines1) > 0

    # Spatial matcher runs purely from the EXIF priors (ENU conversion);
    # neighbors within 100 m -> all pairs considered.
    ppsfm_main(["spatial_matcher", "--database_path", db_path,
                "--min_num_matches", "1"])
    with Database(db_path) as db:
        n_pairs = db.conn.execute(
            "SELECT COUNT(*) FROM matches;").fetchone()[0]
    assert n_pairs >= 1  # pairs attempted (rows exist even when empty)


def test_raw_feature_pair_import(tmp_path):
    rng = np.random.default_rng(1)
    d = str(tmp_path)
    names = _write_image_set(d, rng, num=2)
    db_path = os.path.join(d, "db.db")
    with Database(db_path) as db:
        cam = db.write_camera("SIMPLE_PINHOLE", 96, 96,
                              np.array([80.0, 48.0, 48.0]))
        id1 = db.write_image(names[0], cam)
        id2 = db.write_image(names[1], cam)

    list_path = os.path.join(d, "pairs.txt")
    with open(list_path, "w") as f:
        f.write(f"{names[0]} {names[1]}\n")
        f.write("0 5\n1 6\n2 7\n\n")

    ppsfm_main(["matches_importer", "--database_path", db_path,
                "--match_list_path", list_path, "--match_type", "raw"])
    with Database(db_path) as db:
        m = db.read_matches(id1, id2)
    np.testing.assert_array_equal(m, [[0, 5], [1, 6], [2, 7]])
