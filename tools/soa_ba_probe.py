"""Layout experiment: SoA component arrays vs AoS blocks for the BA
normal-equation build.

Hypothesis (VERDICT r2 weak #4): the dense-block build_normal's
intermediates — Jc (P, K, 2, 6), Jp (P, K, 2, 3), Hcp (P, K, 6, 3) — carry
trailing dims that pad to (8, 128) TPU tiles, inflating HBM traffic up to
~84x.  The SoA variant computes the SAME quantities as flat tuples of
(K, P) component arrays (big axis minor, no padding) with vmapped
per-observation scalar functions.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/soa_ba_probe.py
Prints ms per build for both layouts on the bench problem
(P=20k, K=8, C=100, 120k obs, f32) and max abs differences.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    print(jax.devices(), flush=True)

    from privacy_preserving_sfm_tpu.ops import lie, lines as line_ops
    from privacy_preserving_sfm_tpu.optim import ba as ba_mod
    from privacy_preserving_sfm_tpu.optim import ba_dense

    rng = np.random.default_rng(0)
    C, P, K = 100, 20000, 8
    pts = rng.uniform(-2, 2, (P, 3))
    pts[:, 2] += 8.0
    qs = np.stack([np.array([1.0, 0, 0, 0])] * C)
    ts = rng.uniform(-1, 1, (C, 3))
    obs_cam = rng.integers(0, C, (P, K)).astype(np.int32)
    lines = rng.standard_normal((P, K, 3))
    lines /= np.linalg.norm(lines[..., :2], axis=-1, keepdims=True)
    w = np.ones((P, K))

    dense = ba_dense.DenseBAProblem(
        qvecs=jnp.asarray(qs, jnp.float32),
        tvecs=jnp.asarray(ts, jnp.float32),
        cam_params=jnp.broadcast_to(
            jnp.asarray([500.0, 320.0, 240.0], jnp.float32), (C, 3)),
        points3d=jnp.asarray(pts, jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        obs_line=jnp.asarray(lines, jnp.float32),
        obs_weight=jnp.asarray(w, jnp.float32),
        cam_dof_mask=jnp.ones((C, 6), jnp.float32),
        point_mask=jnp.ones(P, jnp.float32),
        cam_gather=jnp.zeros((C, 1), jnp.int32),
        cam_gather_mask=jnp.zeros((C, 1), jnp.float32))
    model = "SIMPLE_PINHOLE"

    # ---- current AoS build -------------------------------------------
    @jax.jit
    def build_aos(q, t, X):
        r, Jc, Jp = ba_dense._residuals_and_jacobians(dense, q, t, X, model)
        sq = jnp.sum(r * r, axis=-1)
        wgt = ba_mod._robust_weight(sq, "trivial", 1.0) * dense.obs_weight
        Hpp = jnp.einsum("pkri,pkrj,pk->pij", Jp, Jp, wgt)
        Hcp_o = jnp.einsum("pkri,pkrj,pk->pkij", Jc, Jp, wgt)
        gp = jnp.einsum("pkri,pkr,pk->pi", Jp, r, wgt)
        oc_flat = dense.obs_cam.reshape(-1)
        onehot = jax.nn.one_hot(oc_flat, C, dtype=q.dtype)
        Hcc_o = jnp.einsum("pkri,pkrj,pk->pkij", Jc, Jc, wgt).reshape(-1, 36)
        Hcc = jax.lax.dot_general(
            onehot, Hcc_o, (((0,), (0,)), ((), ()))).reshape(C, 6, 6)
        gc_o = jnp.einsum("pkri,pkr,pk->pki", Jc, r, wgt).reshape(-1, 6)
        gc = jax.lax.dot_general(onehot, gc_o, (((0,), (0,)), ((), ())))
        return Hcc, Hpp, Hcp_o, gc, gp

    # ---- SoA build: (K, P) component tuples ---------------------------
    lines_kp = tuple(jnp.asarray(lines[..., i].T, jnp.float32)
                     for i in range(3))  # 3 x (K, P)
    oc_kp = jnp.asarray(obs_cam.T)  # (K, P)
    w_kp = jnp.asarray(w.T, jnp.float32)
    onehot_n = jax.nn.one_hot(obs_cam.T.reshape(-1), C,
                              dtype=jnp.float32)  # (K*P, C)

    def res_comp(dc, dX, q, t, Xp, par, l0, l1, l2):
        """Per-observation scalar residual components (r1, r2)."""
        qq = lie.quat_multiply(q, ba_mod._quat_delta(dc[:3]))
        tt = t + dc[3:]
        line = jnp.stack([l0, l1, l2])
        r = line_ops.line_ba_residual(line, Xp + dX, qq, tt, model, par)
        return r[0], r[1]

    def one(q, t, Xp, par, l0, l1, l2):
        zero6 = jnp.zeros(6, jnp.float32)
        zero3 = jnp.zeros(3, jnp.float32)
        r1, r2 = res_comp(zero6, zero3, q, t, Xp, par, l0, l1, l2)
        Jc = jax.jacfwd(res_comp, argnums=0)(zero6, zero3, q, t, Xp, par,
                                             l0, l1, l2)
        Jp = jax.jacfwd(res_comp, argnums=1)(zero6, zero3, q, t, Xp, par,
                                             l0, l1, l2)
        # Flatten everything to scalars so the vmapped outputs are pure
        # (K, P) arrays — no trailing padded dims ever materialize.
        out = (r1, r2)
        out += tuple(Jc[0][i] for i in range(6))
        out += tuple(Jc[1][i] for i in range(6))
        out += tuple(Jp[0][i] for i in range(3))
        out += tuple(Jp[1][i] for i in range(3))
        return out

    params = jnp.asarray([500.0, 320.0, 240.0], jnp.float32)

    @jax.jit
    def build_soa(q, t, X):
        q_o = q[oc_kp]  # (K, P, 4)
        t_o = t[oc_kp]
        Xb = jnp.broadcast_to(X[None], (K,) + X.shape)
        par = jnp.broadcast_to(params, (K, P, 3))
        outs = jax.vmap(jax.vmap(one))(q_o, t_o, Xb, par, *lines_kp)
        r1, r2 = outs[0], outs[1]
        jc = outs[2:14]   # 12 x (K, P): rows r1(6), r2(6)
        jp = outs[14:20]  # 6 x (K, P)
        sq = r1 * r1 + r2 * r2
        wgt = ba_mod._robust_weight(sq, "trivial", 1.0) * w_kp

        # Hpp: 6 unique components, reduce over K.
        def pp(i, j):
            return jnp.sum((jp[i] * jp[j] + jp[3 + i] * jp[3 + j]) * wgt,
                           axis=0)

        Hpp_c = [pp(i, j) for i in range(3) for j in range(i, 3)]
        gp_c = [jnp.sum((jp[i] * r1 + jp[3 + i] * r2) * wgt, axis=0)
                for i in range(3)]
        # Hcp per observation: 18 components (K, P).
        Hcp_c = [(jc[i] * jp[j] + jc[6 + i] * jp[3 + j]) * wgt
                 for i in range(6) for j in range(3)]
        # Camera side: stack 21 + 6 components -> (27, K*P) @ (K*P, C).
        cam_rows = [(jc[i] * jc[j] + jc[6 + i] * jc[6 + j]) * wgt
                    for i in range(6) for j in range(i, 6)]
        cam_rows += [(jc[i] * r1 + jc[6 + i] * r2) * wgt for i in range(6)]
        stackc = jnp.stack([c.reshape(-1) for c in cam_rows])  # (27, K*P)
        cam_sums = jax.lax.dot_general(
            stackc, onehot_n, (((1,), (0,)), ((), ())))  # (27, C)
        return (tuple(Hpp_c), tuple(gp_c), tuple(Hcp_c), cam_sums)

    def timeit(fn, *args, reps=5):
        out = fn(*args)
        jax.block_until_ready(out)
        ts_ = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts_.append(time.perf_counter() - t0)
        return min(ts_), out

    q0, t0_, X0 = dense.qvecs, dense.tvecs, dense.points3d
    t_aos, out_aos = timeit(build_aos, q0, t0_, X0)
    t_soa, out_soa = timeit(build_soa, q0, t0_, X0)
    print(f"AoS build_normal: {t_aos*1e3:.2f} ms")
    print(f"SoA build_normal: {t_soa*1e3:.2f} ms  ({t_aos/t_soa:.1f}x)")

    # Correctness: compare Hpp / gp / Hcc / gc.
    Hcc_a, Hpp_a, Hcp_a, gc_a, gp_a = [np.asarray(x) for x in out_aos]
    Hpp_c, gp_c, Hcp_c, cam_sums = out_soa
    idx = 0
    errs = []
    for i in range(3):
        for j in range(i, 3):
            errs.append(np.abs(np.asarray(Hpp_c[idx])
                               - Hpp_a[:, i, j]).max())
            idx += 1
    print("max |dHpp|:", max(errs))
    errs = [np.abs(np.asarray(gp_c[i]) - gp_a[:, i]).max()
            for i in range(3)]
    print("max |dgp|:", max(errs))
    cam = np.asarray(cam_sums)
    k = 0
    errs = []
    for i in range(6):
        for j in range(i, 6):
            errs.append(np.abs(cam[k] - Hcc_a[:, i, j]).max())
            k += 1
    for i in range(6):
        errs.append(np.abs(cam[21 + i] - gc_a[:, i]).max())
    print("max |dHcc/gc|:", max(errs))
    ek = 0
    errs = []
    for i in range(6):
        for j in range(3):
            errs.append(np.abs(np.asarray(Hcp_c[ek]).T
                               - Hcp_a[:, :, i, j]).max())
            ek += 1
    print("max |dHcp|:", max(errs))


if __name__ == "__main__":
    main()
