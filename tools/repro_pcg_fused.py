"""Minimal repro harness for the fused Pallas PCG in-context TPU fault.

Round-3 finding (commit e0b7a29, note in optim/ba_dense.py): the fused PCG
kernel (optim/schur_pcg.pcg_fused - whole CG loop in one Pallas kernel, S and
all CG vectors VMEM-resident) is a measured ~1 ms/LM-iteration win standalone,
but compiled INSIDE the dense-block LM ``lax.while_loop`` it intermittently
faulted the TPU worker: box50 global BA at 16 registered images crashed 3/3 at
the same solve, while (a) the identical problem solved clean with the in-jit
XLA fori-loop PCG and (b) the kernel alone survived even NaN inputs.  The
default is therefore the XLA loop (PPSFM_PCG=fused re-enables the kernel).

This tool reproduces the failing program shape standalone so the kernel can be
re-qualified after any toolchain change:

  1. builds a synthetic global-BA problem at the exact failing bucket
     (C=16 cameras, P=4096 points, K=8 obs/point, SIMPLE_PINHOLE),
  2. runs ``ba_dense.bundle_adjust_dense`` twice per mode - PPSFM_PCG unset
     (XLA loop) then PPSFM_PCG=fused - under fresh jit closures,
  3. prints PASS/FAULT per mode; a fault kills the process (the TPU worker
     aborts), so run it LAST or in a disposable session.

If a real-run capture is needed instead of the synthetic scene, run the
pipeline with PPSFM_BA_DUMP=/tmp/ba_dump and replay the saved .npz here via
--npz (the dump carries every problem tensor plus the solver options).

Usage:
  python tools/repro_pcg_fused.py             # synthetic repro, both modes
  python tools/repro_pcg_fused.py --npz FILE  # replay a PPSFM_BA_DUMP file
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_synthetic(C=16, P=4096, K=8, seed=0):
    """Global-BA-shaped problem: C upright cameras on an arc, P box points."""
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp
    from privacy_preserving_sfm_tpu.optim import ba as ba_mod

    pts = rng.uniform(-1, 1, (P, 3)) * np.array([4.0, 2.0, 4.0])
    angles = np.linspace(-0.5, 0.5, C)
    qvecs = np.stack([np.array([np.cos(a / 2), 0, np.sin(a / 2), 0])
                      for a in angles])
    tvecs = np.stack([np.array([2.0 * np.sin(a), 0.1 * i / C,
                                8.0 + 0.5 * np.cos(a)])
                      for i, a in enumerate(angles)])
    obs_cam = rng.integers(0, C, (P, K)).astype(np.int32)
    obs_point = np.repeat(np.arange(P, dtype=np.int32)[:, None], K, axis=1)

    # Lift each observation to a random line through the projected point.
    def rot(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])

    lines = np.zeros((P, K, 3))
    for c in range(C):
        m = obs_cam == c
        Xc = pts[np.nonzero(m)[0] % P] @ rot(qvecs[c]).T + tvecs[c]
        xh = Xc / Xc[:, 2:3]
        d = rng.normal(size=(m.sum(), 2))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        n = np.stack([-d[:, 1], d[:, 0]], axis=1)
        cterm = -(n * xh[:, :2]).sum(1)
        lines[m] = np.column_stack([n, cterm])

    flat = ba_mod.BAProblem(
        qvecs=jnp.asarray(qvecs), tvecs=jnp.asarray(tvecs),
        cam_params=jnp.asarray(np.tile([600.0, 320.0, 240.0], (C, 1))),
        points3d=jnp.asarray(pts + rng.normal(scale=0.01, size=(P, 3))),
        obs_cam=jnp.asarray(obs_cam.reshape(-1)),
        obs_point=jnp.asarray(obs_point.reshape(-1)),
        obs_line=jnp.asarray(lines.reshape(-1, 3)),
        obs_weight=jnp.ones(P * K),
        cam_dof_mask=jnp.asarray(
            np.r_[np.zeros((1, 6)), np.ones((C - 1, 6))]),
        point_mask=jnp.ones(P))
    return flat, "SIMPLE_PINHOLE"


def run_once(flat, model, mode):
    import jax
    from privacy_preserving_sfm_tpu.optim import ba as ba_mod
    from privacy_preserving_sfm_tpu.optim import ba_dense

    os.environ["PPSFM_PCG"] = mode
    opts = ba_mod.BAOptions(max_iterations=25, schur_mode="explicit")
    dense = ba_dense.from_flat_problem(flat)
    t0 = time.time()
    fn = jax.jit(lambda p: ba_dense.bundle_adjust_dense(p, model, opts))
    q, t, X, summary = fn(dense)
    q.block_until_ready()
    print(f"  mode={mode!r}: OK  {time.time() - t0:.1f}s  "
          f"iters={int(summary.num_iterations)}  "
          f"cost {float(summary.initial_cost):.3e} -> "
          f"{float(summary.final_cost):.3e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", help="replay a PPSFM_BA_DUMP capture")
    ap.add_argument("--modes", default="xla,fused")
    args = ap.parse_args()

    import jax
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    if args.npz:
        import jax.numpy as jnp
        from privacy_preserving_sfm_tpu.optim import ba as ba_mod
        d = np.load(args.npz)
        flat = ba_mod.BAProblem(
            qvecs=jnp.asarray(d["qvecs"]), tvecs=jnp.asarray(d["tvecs"]),
            cam_params=jnp.asarray(d["cam_params"]),
            points3d=jnp.asarray(d["points3d"]),
            obs_cam=jnp.asarray(d["obs_cam"]),
            obs_point=jnp.asarray(d["obs_point"]),
            obs_line=jnp.asarray(d["obs_line"]),
            obs_weight=jnp.asarray(d["obs_weight"]),
            cam_dof_mask=jnp.asarray(d["dof_mask"]),
            point_mask=jnp.asarray(d["point_mask"]))
        model = str(d["model"])
        print(f"replaying {args.npz}: C={flat.qvecs.shape[0]} "
              f"P={flat.points3d.shape[0]} O={flat.obs_cam.shape[0]}")
    else:
        flat, model = build_synthetic()
        print("synthetic global-BA problem: C=16 P=4096 K=8")

    for mode in args.modes.split(","):
        # A worker fault aborts the process before the next line prints.
        print(f"running mode={mode!r} (a TPU worker fault would abort "
              "the process here)...", flush=True)
        run_once(flat, model, mode)
    print("ALL MODES PASSED")


if __name__ == "__main__":
    sys.exit(main())
