"""PROSAC progressive sampler + SPRT-style subset prescreen tests."""

import jax
import jax.numpy as jnp
import numpy as np

from privacy_preserving_sfm_tpu.solvers import ransac


def test_prosac_prefix_schedule_monotone():
    n = ransac.prosac_prefix_sizes(100, 6, 4096)
    # The reference grows n on the first draw already (t == T'_n == 1).
    assert n[0] == 7
    assert (np.diff(n) >= 0).all()
    assert n[-1] <= 100


def test_progressive_sampling_prefers_top_ranked():
    key = jax.random.PRNGKey(0)
    N, B, m = 200, 2048, 6
    valid = np.ones(N, bool)
    rank = jnp.arange(N, dtype=jnp.float32)  # identity quality order
    idx = np.asarray(ransac.draw_samples_progressive(
        key, N, jnp.asarray(valid), m, B, rank))
    # Distinct within each sample; all valid.
    for b in (0, B // 2, B - 1):
        assert len(set(idx[b].tolist())) == m
    assert idx.min() >= 0 and idx.max() < N
    # Early hypotheses concentrate on the best-ranked prefix (the prefix
    # grows by ~1 per hypothesis at these parameters), late ones spread.
    assert idx[:64].max() <= 6 + 64 + 1, idx[:64].max()
    assert idx[:64].mean() < idx[-512:].mean()
    assert idx[-512:].max() > 80  # late prefix widens substantially


def test_progressive_sampling_respects_validity():
    key = jax.random.PRNGKey(1)
    N = 64
    valid = np.zeros(N, bool)
    valid[:20] = True
    rank = jnp.arange(N, dtype=jnp.float32)
    idx = np.asarray(ransac.draw_samples_progressive(
        key, N, jnp.asarray(valid), 4, 512, rank))
    assert idx.max() < 20


def test_subset_prescreen_keeps_good_hypothesis():
    rng = np.random.default_rng(0)
    B, n_sub = 256, 32
    res = rng.uniform(1.0, 10.0, (B, n_sub))  # all bad
    res[137] = rng.uniform(0.0, 0.05, n_sub)  # the one good hypothesis
    keep = ransac.subset_prescreen(
        jnp.asarray(res), 0.1, jnp.ones(n_sub, bool), keep=16)
    assert 137 in np.asarray(keep)
