"""Native graph must agree with the pure-Python correspondence graph."""

import numpy as np
import pytest

from privacy_preserving_sfm_tpu.models.correspondence_graph import (
    CorrespondenceGraph,
)
from privacy_preserving_sfm_tpu.models import native_graph


pytestmark = pytest.mark.skipif(not native_graph.available(),
                                reason="native library unavailable")


def build_both(rng, num_images=6, num_lines=40, pair_prob=0.7):
    py = CorrespondenceGraph()
    nat = native_graph.NativeCorrespondenceGraph()
    for a in range(1, num_images + 1):
        for b in range(a + 1, num_images + 1):
            if rng.uniform() > pair_prob:
                continue
            k = rng.integers(5, 25)
            i1 = rng.choice(num_lines, k, replace=False).astype(np.uint32)
            i2 = rng.choice(num_lines, k, replace=False).astype(np.uint32)
            m = np.stack([i1, i2], 1)
            py.add_matches(a, b, m)
            nat.add_matches(a, b, m)
    py.finalize()
    nat.finalize()
    return py, nat


class TestNativeGraph:
    def test_correspondences_match(self):
        rng = np.random.default_rng(0)
        py, nat = build_both(rng)
        for img in range(1, 7):
            for li in range(40):
                a = sorted(py.find_correspondences(img, li))
                b = sorted(nat.find_correspondences(img, li))
                assert a == b, (img, li, a, b)

    def test_transitive_match(self):
        rng = np.random.default_rng(1)
        py, nat = build_both(rng)
        for img in range(1, 7):
            for li in range(0, 40, 3):
                a = set(py.find_transitive_correspondences(img, li, 3))
                b = set(nat.find_transitive_correspondences(img, li, 3))
                assert a == b

    def test_two_view(self):
        rng = np.random.default_rng(2)
        py, nat = build_both(rng, pair_prob=0.3)
        for img in range(1, 7):
            for li in range(40):
                assert (py.is_two_view_observation(img, li)
                        == nat.is_two_view_observation(img, li))

    def test_track_assembly_matches_python_reference(self):
        rng = np.random.default_rng(3)
        py, nat = build_both(rng, num_images=6, num_lines=30, pair_prob=0.9)
        aligned = {i: (rng.uniform(size=30) < 0.5).astype(np.uint8)
                   for i in range(1, 7)}
        all_ids = list(range(1, 7))
        seeds = [1, 2, 3]

        # Python reference enumeration (the mapper's original inline code).
        expected = {}
        for image_id in seeds:
            for li in range(30):
                is_al = bool(aligned[image_id][li])
                if not is_al:
                    continue
                corrs = [c for c in py.find_correspondences(image_id, li)
                         if bool(aligned[c[0]][c[1]]) == is_al]
                if len(corrs) < 3:
                    continue
                n = len(corrs)
                for i in range(n):
                    for j in range(i + 1, n):
                        for k in range(j + 1, n):
                            cand = sorted({(image_id, li), corrs[i],
                                           corrs[j], corrs[k]})
                            if len({c[0] for c in cand}) != 4:
                                continue
                            key = tuple(c[0] for c in cand)
                            expected.setdefault(key, set()).add(
                                tuple(c[1] for c in cand))

        got = nat.assemble_four_view_tracks(seeds, all_ids, aligned, True)
        assert set(got.keys()) == set(expected.keys())
        for key in expected:
            assert {tuple(int(v) for v in row) for row in got[key]} \
                == expected[key]
