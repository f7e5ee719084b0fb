"""Worker process for the 2-process x 4-device multihost BA test.

Launched by tests/test_multihost.py with PPSFM_COORDINATOR /
PPSFM_NUM_PROCESSES / PPSFM_PROCESS_ID set.  Builds the same synthetic BA
problem on every process, solves it with the multi-process sharded solver
over the global 8-device mesh, checks the replicated camera output against
the local single-process solver, and prints MULTIHOST_OK on success.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from privacy_preserving_sfm_tpu.parallel import distributed_ba, multihost

    assert multihost.initialize_from_env(), "expected multi-process env"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    from privacy_preserving_sfm_tpu.optim import ba
    from test_ba import make_ba_problem

    rng = np.random.default_rng(0)
    problem, qs_gt, ts_gt, pts_gt = make_ba_problem(rng, num_cams=6,
                                                    num_points=60)
    n = len(jax.devices())
    sharded, meta = distributed_ba.shard_problem(problem, n)

    mesh = multihost.global_mesh()
    gproblem = multihost.make_global_problem(sharded, mesh)

    q, t, X, summary = distributed_ba.bundle_adjust_sharded(
        gproblem, mesh, "SIMPLE_PINHOLE")
    jax.block_until_ready((q, t, X))

    final = float(np.asarray(jax.device_get(
        [s.data for s in summary.final_cost.addressable_shards][0])))
    assert final < 1e-12, final  # exact recovery on perfect data

    # Replicated camera outputs vs ground truth.
    q_np = np.asarray(jax.device_get(
        [s.data for s in q.addressable_shards][0]))
    t_np = np.asarray(jax.device_get(
        [s.data for s in t.addressable_shards][0]))
    sign = np.sign(np.sum(q_np * qs_gt, axis=-1, keepdims=True))
    assert np.allclose(q_np, sign * qs_gt, atol=1e-6), \
        np.abs(q_np - sign * qs_gt).max()
    assert np.allclose(t_np, ts_gt, atol=1e-6), np.abs(t_np - ts_gt).max()

    # Sharded point output: every local shard must match ground truth
    # through the (shard, slot) mapping.
    ps, slot = meta["point_shard"], meta["point_slot"]
    pps = sharded.points3d.shape[0] // n
    gt_by_slot = np.zeros((n, pps, 3))
    gt_by_slot[ps, slot] = pts_gt
    for s in X.addressable_shards:
        shard_idx = s.index[0].start // pps
        got = np.asarray(jax.device_get(s.data)).reshape(-1, 3)
        assert np.allclose(got, gt_by_slot[shard_idx], atol=1e-5), \
            np.abs(got - gt_by_slot[shard_idx]).max()

    final = float(np.asarray(jax.device_get(
        [s.data for s in summary.final_cost.addressable_shards][0])))
    assert np.isfinite(final)
    print(f"MULTIHOST_OK process={jax.process_index()} cost={final}",
          flush=True)


if __name__ == "__main__":
    main()
