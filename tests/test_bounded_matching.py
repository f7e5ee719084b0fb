"""Bounded-memory (block-resident) matching scheduler tests.

The round-1 scheduler loaded every image's descriptors into one padded
device array (OOM at ~1000+ images); ``match_pair_list`` now partitions
into block-resident tiles when over ``max_resident_images``
(``matching.h:125-151`` LRU-cache role).  Asserts block mode produces the
same matches as fully-resident mode, and that a 1000-image pair list runs
with a tiny residency bound.
"""

import numpy as np

from privacy_preserving_sfm_tpu.features import schedulers
from privacy_preserving_sfm_tpu.models.database import Database


def _make_db(path, rng, num_images, num_feats=48):
    """Images with descriptor sets where consecutive images share half."""
    with Database(path) as db:
        cam = db.write_camera("SIMPLE_PINHOLE", 64, 64,
                              np.array([50.0, 32.0, 32.0]))
        # SIFT-convention descriptors: 512 * unit-L2 (matcher normalizes
        # dot products by 512^2).
        d = rng.dirichlet(np.ones(128), (num_images + 1, num_feats))
        base = np.clip(np.round(512 * np.sqrt(d)), 0, 255).astype(np.uint8)
        ids = []
        for i in range(num_images):
            iid = db.write_image(f"im{i:04d}.png", cam)
            ids.append(iid)
            # First half of features shared with the next image.
            d = np.concatenate([base[i][:num_feats // 2],
                                base[i + 1][:num_feats - num_feats // 2]])
            db.write_descriptors(iid, d)
            db.write_lines(iid, np.tile([1.0, 0.0, 0.0], (num_feats, 1)),
                           np.zeros(num_feats, bool))
    return ids


def _read_matches(path, pairs):
    with Database(path) as db:
        return {p: db.read_matches(*p) for p in pairs}


def test_block_mode_matches_resident_mode(tmp_path):
    rng = np.random.default_rng(0)
    p1 = str(tmp_path / "resident.db")
    p2 = str(tmp_path / "blocked.db")
    ids1 = _make_db(p1, rng, 24)
    rng = np.random.default_rng(0)
    ids2 = _make_db(p2, rng, 24)
    pairs1 = schedulers.sequential_pairs(ids1, overlap=3)
    pairs2 = schedulers.sequential_pairs(ids2, overlap=3)

    with Database(p1) as db:
        n1 = schedulers.match_pair_list(db, ids1, pairs1, min_num_matches=5,
                                        max_resident_images=None)
    with Database(p2) as db:
        n2 = schedulers.match_pair_list(db, ids2, pairs2, min_num_matches=5,
                                        max_resident_images=8)
    assert n1 == n2 and n1 > 0
    m1 = _read_matches(p1, pairs1)
    m2 = _read_matches(p2, pairs2)
    for p in pairs1:
        np.testing.assert_array_equal(m1[p], m2[p])


def test_thousand_images_bounded(tmp_path):
    """1000 images, sequential pair list, residency bound of 64 images."""
    rng = np.random.default_rng(1)
    path = str(tmp_path / "big.db")
    ids = _make_db(path, rng, 1000, num_feats=16)
    pairs = schedulers.sequential_pairs(ids, overlap=1,
                                        quadratic_overlap=False)
    assert len(pairs) == 999
    with Database(path) as db:
        n = schedulers.match_pair_list(db, ids, pairs, min_num_matches=4,
                                       max_resident_images=64)
    # Consecutive images share half their descriptors -> all pairs match.
    assert n == 999, n
