"""Multi-chip tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserving_sfm_tpu.optim import ba as ba_mod
from privacy_preserving_sfm_tpu.parallel import distributed_ba, sharded_matching
from test_ba import make_ba_problem


class TestDistributedBA:
    def test_matches_single_device_result(self):
        assert len(jax.devices()) >= 8, "conftest should provide 8 devices"
        rng = np.random.default_rng(0)
        problem, qs, ts, pts = make_ba_problem(rng, num_cams=6, num_points=60)

        # Single-device reference run.
        q1, t1, X1, s1 = ba_mod.bundle_adjust(problem, "SIMPLE_PINHOLE")

        mesh = distributed_ba.make_mesh(8)
        sharded, meta = distributed_ba.shard_problem(problem, 8)
        q2, t2, X2, s2 = distributed_ba.bundle_adjust_sharded(
            sharded, mesh, "SIMPLE_PINHOLE")

        assert float(s2.final_cost) < 1e-12, float(s2.final_cost)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), atol=1e-6)
        # Points come back in sharded slot order; compare via the mapping.
        X2 = np.asarray(X2).reshape(8, -1, 3)
        ps, slot = meta["point_shard"], meta["point_slot"]
        for pid in range(len(pts)):
            np.testing.assert_allclose(X2[ps[pid], slot[pid]], pts[pid],
                                       atol=1e-5)

    def test_shard_balance(self):
        rng = np.random.default_rng(1)
        problem, *_ = make_ba_problem(rng, num_cams=6, num_points=64)
        _, meta = distributed_ba.shard_problem(problem, 8)
        counts = np.bincount(meta["point_shard"], minlength=8)
        assert counts.max() - counts.min() <= 1


class TestShardedMatching:
    def test_matches_unsharded(self):
        rng = np.random.default_rng(2)
        d = rng.dirichlet(np.ones(128), (4, 32))
        desc = np.clip(np.round(512 * np.sqrt(d)), 0, 255).astype(np.uint8)
        desc[1] = desc[0]
        desc[3] = desc[2]
        valid = np.ones((4, 32), bool)
        pairs = np.asarray([[0, 1], [2, 3], [0, 2], [1, 3],
                            [0, 3], [1, 2], [0, 1], [2, 3]], np.int32)
        mesh = distributed_ba.make_mesh(8)
        res = sharded_matching.match_pairs_sharded(
            jnp.asarray(desc), jnp.asarray(valid), jnp.asarray(pairs), mesh)
        m = np.asarray(res.matches)
        assert (m[0] == np.arange(32)).all()
        assert (m[1] == np.arange(32)).all()

    def test_pair_lists(self):
        pairs = sharded_matching.exhaustive_pair_list(10, block_size=4)
        assert len(pairs) == 45
        assert len({tuple(p) for p in pairs}) == 45
        seq = sharded_matching.sequential_pair_list(20, overlap=3)
        assert (seq[:, 0] < seq[:, 1]).all()
        assert (1, 2) in {tuple(p) for p in seq}
