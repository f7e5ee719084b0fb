"""A/B the bidirectional top-2 matcher kernel vs the two-pass baseline.

Qualifies top2_scores_bidir on the real chip (match tables must be
IDENTICAL to two swapped top2_scores passes) and measures the pairs/s
gain at bench shapes (8192x8192, the exhaustive-scheduler block regime).
VERDICT round-3 ask #8.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/matcher_ab.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from privacy_preserving_sfm_tpu.features import matching, matching_kernels
    from privacy_preserving_sfm_tpu.utils.jax_setup import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n = 8192
    n_imgs, n_pairs = 8, 32
    desc = jnp.asarray(rng.integers(0, 256, (n_imgs, n, 128)), jnp.uint8)
    valid = jnp.asarray(rng.random((n_imgs, n)) > 0.1)
    pairs = jnp.asarray(rng.integers(0, n_imgs, (n_pairs, 2)), jnp.int32)

    d1s, d2s = desc[pairs[:, 0]], desc[pairs[:, 1]]
    v1s, v2s = valid[pairs[:, 0]], valid[pairs[:, 1]]

    two_pass = jax.jit(lambda a, b, v1, v2: (
        matching_kernels.top2_scores(a, b, v2)
        + matching_kernels.top2_scores(b, a, v1)))
    bidir = jax.jit(matching_kernels.top2_scores_bidir)

    # Correctness: identical tables on-chip.
    ref = [np.asarray(x) for x in two_pass(d1s, d2s, v1s, v2s)]
    got = [np.asarray(x) for x in bidir(d1s, d2s, v1s, v2s)]
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(g, r, err_msg=f"output {i}")
    print("tables identical (6/6 outputs) at B=32 8192x8192", flush=True)

    def bench(fn, label):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(d1s, d2s, v1s, v2s))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{label}: {n_pairs / best:.1f} pairs/s "
              f"({best * 1e3 / n_pairs:.2f} ms/pair)", flush=True)
        return n_pairs / best

    r_two = bench(two_pass, "two-pass ")
    r_bi = bench(bidir, "bidir    ")
    print(f"speedup: {r_bi / r_two:.2f}x", flush=True)

    # End-to-end production path (match_many_pairs includes gates).
    match = jax.jit(lambda d, v, p: matching.match_many_pairs(d, v, p))
    jax.block_until_ready(match(desc, valid, pairs))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(match(desc, valid, pairs))
        ts.append(time.perf_counter() - t0)
    print(f"match_many_pairs e2e: {n_pairs / min(ts):.1f} pairs/s",
          flush=True)


if __name__ == "__main__":
    main()
