"""Fused int8 top-2 matching kernel vs the XLA formulation (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from privacy_preserving_sfm_tpu.features import matching, matching_kernels


def _xla_top2(d1, d2, v1, v2):
    dots = matching.descriptor_dots(d1, d2)
    dots = jnp.where(v1[:, None], dots, -matching.BIG)
    dots = jnp.where(v2[None, :], dots, -matching.BIG)
    return matching._top2_max(dots, axis=1)


def _rand_desc(rng, n):
    # Realistic range: 512 * L1-root normalized, most mass small.
    d = rng.integers(0, 256, (n, 128)).astype(np.uint8)
    return d


class TestTop2Kernel:
    def test_matches_xla_formulation(self):
        rng = np.random.default_rng(0)
        b, n1, n2 = 3, 384, 512
        d1 = np.stack([_rand_desc(rng, n1) for _ in range(b)])
        d2 = np.stack([_rand_desc(rng, n2) for _ in range(b)])
        v2 = np.ones((b, n2), bool)
        v2[1, 300:] = False  # padding mask in one pair
        bd, sd, idx = matching_kernels.top2_scores(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2),
            interpret=True)
        for p in range(b):
            bd_x, sd_x, idx_x = _xla_top2(
                jnp.asarray(d1[p]), jnp.asarray(d2[p]),
                jnp.ones(n1, bool), jnp.asarray(v2[p]))
            np.testing.assert_array_equal(np.asarray(idx[p]),
                                          np.asarray(idx_x))
            np.testing.assert_allclose(np.asarray(bd[p]), np.asarray(bd_x))
            np.testing.assert_allclose(np.asarray(sd[p]), np.asarray(sd_x))

    def test_duplicate_descriptors_tie(self):
        """Exact duplicates: first-occurrence argmax, second == best."""
        rng = np.random.default_rng(1)
        d2 = _rand_desc(rng, 256)
        d2[77] = d2[200]  # duplicate pair
        d1 = d2[200:201].repeat(128, axis=0)
        bd, sd, idx = matching_kernels.top2_scores(
            jnp.asarray(d1[None]), jnp.asarray(d2[None]),
            jnp.ones((1, 256), bool), interpret=True)
        assert int(idx[0, 0]) == 77  # first occurrence
        assert float(bd[0, 0]) == float(sd[0, 0])  # tie -> ratio ~1

    def test_no_valid_candidates(self):
        rng = np.random.default_rng(2)
        d1 = _rand_desc(rng, 128)[None]
        d2 = _rand_desc(rng, 128)[None]
        v2 = np.zeros((1, 128), bool)
        bd, sd, _ = matching_kernels.top2_scores(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v2),
            interpret=True)
        # Gates must reject: reconstructed dots are hugely negative.
        ang = np.arccos(np.clip(np.asarray(bd) * matching.DIST_NORM,
                                -1.0, 1.0))
        assert (ang > 3.0).all()

    def test_bidir_matches_two_pass(self):
        """Single-stream bidirectional kernel == two swapped passes."""
        rng = np.random.default_rng(4)
        b, n1, n2 = 2, 384, 512
        d1 = np.stack([_rand_desc(rng, n1) for _ in range(b)])
        d2 = np.stack([_rand_desc(rng, n2) for _ in range(b)])
        d2[0, 40] = d1[0, 7]    # exact duplicate across images
        d2[0, 300] = d1[0, 7]   # second duplicate -> tie in both dirs
        v1 = np.ones((b, n1), bool)
        v2 = np.ones((b, n2), bool)
        v1[1, 250:] = False
        v2[1, 400:] = False
        args = (jnp.asarray(d1), jnp.asarray(d2))
        bd12, sd12, i12, bd21, sd21, i21 = matching_kernels.top2_scores_bidir(
            *args, jnp.asarray(v1), jnp.asarray(v2), interpret=True)
        bd12r, sd12r, i12r = matching_kernels.top2_scores(
            *args, jnp.asarray(v2), interpret=True)
        bd21r, sd21r, i21r = matching_kernels.top2_scores(
            args[1], args[0], jnp.asarray(v1), interpret=True)
        np.testing.assert_array_equal(np.asarray(i12), np.asarray(i12r))
        np.testing.assert_array_equal(np.asarray(i21), np.asarray(i21r))
        np.testing.assert_allclose(np.asarray(bd12), np.asarray(bd12r))
        np.testing.assert_allclose(np.asarray(sd12), np.asarray(sd12r))
        np.testing.assert_allclose(np.asarray(bd21), np.asarray(bd21r))
        np.testing.assert_allclose(np.asarray(sd21), np.asarray(sd21r))

    def test_match_descriptors_end_to_end_interpret(self, monkeypatch):
        """Force the kernel path through match_descriptors (interpret)."""
        rng = np.random.default_rng(3)
        d1 = _rand_desc(rng, 256)
        d2 = np.concatenate([d1[:100], _rand_desc(rng, 156)])
        orig = matching_kernels.top2_scores_bidir
        monkeypatch.setattr(matching, "_use_kernel", lambda *a: True)
        monkeypatch.setattr(
            matching_kernels, "top2_scores_bidir",
            lambda a, b, v1, v2, interpret=False: orig(a, b, v1, v2,
                                                       interpret=True))
        res_k = matching.match_descriptors(jnp.asarray(d1), jnp.asarray(d2))
        monkeypatch.setattr(matching, "_use_kernel", lambda *a: False)
        res_x = matching.match_descriptors(jnp.asarray(d1), jnp.asarray(d2))
        np.testing.assert_array_equal(np.asarray(res_k.matches),
                                      np.asarray(res_x.matches))
        assert int(res_k.num_matches) == int(res_x.num_matches)
        np.testing.assert_allclose(np.asarray(res_k.best_dist),
                                   np.asarray(res_x.best_dist), atol=1e-6)
