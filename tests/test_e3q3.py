"""Tests for the polynomial root finder and the batched 3Q3 solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserving_sfm_tpu.ops import e3q3, polynomial


class TestPolynomial:
    def test_polymul(self):
        a = jnp.asarray([1.0, 2.0])  # 1 + 2x
        b = jnp.asarray([3.0, 0.0, 1.0])  # 3 + x^2
        c = polynomial.polymul(a, b)
        np.testing.assert_allclose(c, [3.0, 6.0, 1.0, 2.0])

    def test_polyval_matches_numpy(self):
        rng = np.random.default_rng(0)
        c = rng.standard_normal((4, 9))
        x = rng.standard_normal(4)
        out = polynomial.polyval(jnp.asarray(c), jnp.asarray(x))
        ref = [np.polyval(c[i][::-1], x[i]) for i in range(4)]
        np.testing.assert_allclose(out, ref, atol=1e-12)

    def test_aberth_known_roots(self):
        # p(x) = (x-1)(x-2)(x-3)(x+4) ...
        true_roots = np.array([1.0, 2.0, 3.0, -4.0, 0.5, -0.25, 7.0, -1.5])
        c = np.poly(true_roots)[::-1].copy()  # ascending
        roots, is_real = polynomial.real_roots(jnp.asarray(c)[None, :])
        got = np.sort(np.asarray(roots)[0])
        np.testing.assert_allclose(got, np.sort(true_roots), atol=1e-8)
        assert bool(np.all(np.asarray(is_real)))

    def test_aberth_complex_pairs(self):
        # (x^2+1)(x-2)(x+3) -> only 2 real roots
        c = np.poly([1j, -1j, 2.0, -3.0]).real[::-1].copy()
        roots, is_real = polynomial.real_roots(jnp.asarray(c)[None, :])
        real = np.sort(np.asarray(roots)[0][np.asarray(is_real)[0]])
        np.testing.assert_allclose(real, [-3.0, 2.0], atol=1e-8)
        assert int(np.asarray(is_real).sum()) == 2

    def test_batch(self):
        rng = np.random.default_rng(1)
        true = rng.uniform(-2, 2, (16, 8))
        cs = np.stack([np.poly(t)[::-1] for t in true])
        roots, is_real = polynomial.real_roots(jnp.asarray(cs))
        assert bool(np.all(np.asarray(is_real)))
        np.testing.assert_allclose(np.sort(np.asarray(roots), axis=-1),
                                   np.sort(true, axis=-1), atol=1e-6)


def random_quadric_system(rng, batch=()):
    """Generate 3Q3 systems with at least one known real solution."""
    coeffs = rng.standard_normal(batch + (3, 10))
    sol = rng.standard_normal(batch + (3,))
    x, y, z = sol[..., 0], sol[..., 1], sol[..., 2]
    mono = np.stack([x * x, x * y, x * z, y * y, y * z, z * z,
                     x, y, z, np.ones_like(x)], axis=-1)
    # Adjust the constant term so `sol` solves each quadric exactly.
    val = np.einsum("...km,...m->...k", coeffs, mono)
    coeffs[..., 9] -= val
    return coeffs, sol


class TestE3Q3:
    def test_recovers_planted_solution(self):
        rng = np.random.default_rng(2)
        coeffs, sol = random_quadric_system(rng, (32,))
        sols, valid = e3q3.solve_e3q3(jnp.asarray(coeffs))
        # Planted solution must appear among valid solutions.
        d = np.linalg.norm(np.asarray(sols) - sol[:, None, :], axis=-1)
        d = np.where(np.asarray(valid), d, np.inf)
        assert float(d.min(axis=-1).max()) < 1e-6

    def test_all_valid_solutions_solve_system(self):
        rng = np.random.default_rng(3)
        coeffs, _ = random_quadric_system(rng, (16,))
        coeffs_j = jnp.asarray(coeffs)
        sols, valid = e3q3.solve_e3q3(coeffs_j)
        res = np.abs(np.asarray(e3q3.quadric_residuals(coeffs_j, sols)))
        res = res.max(axis=-1)  # (16, 8)
        ok = ~np.asarray(valid) | (res < 1e-6)
        assert bool(np.all(ok)), f"max residual {res[np.asarray(valid)].max()}"

    def test_degenerate_random_var_change(self):
        # Quadratic parts x^2, y^2, z^2 (one per equation): linearly
        # independent forms, but the quadratic 3x3 block is singular for
        # every pivot choice, so the solver must take the
        # random-affine-change path (re3q3.h:39-64 analogue).  The change
        # of variables mixes the monomials and makes the blocks regular.
        rng = np.random.default_rng(4)
        coeffs = np.zeros((4, 3, 10))
        coeffs[:, 0, 0] = rng.standard_normal(4)  # eq0: x^2
        coeffs[:, 1, 3] = rng.standard_normal(4)  # eq1: y^2
        coeffs[:, 2, 5] = rng.standard_normal(4)  # eq2: z^2
        coeffs[..., 6:9] = rng.standard_normal((4, 3, 3))  # linear terms
        sol = rng.standard_normal((4, 3))
        x, y, z = sol[..., 0], sol[..., 1], sol[..., 2]
        mono = np.stack([x * x, x * y, x * z, y * y, y * z, z * z,
                         x, y, z, np.ones_like(x)], axis=-1)
        val = np.einsum("...km,...m->...k", coeffs, mono)
        coeffs[..., 9] -= val
        sols, valid = e3q3.solve_e3q3(jnp.asarray(coeffs),
                                      key=jax.random.PRNGKey(0))
        d = np.linalg.norm(np.asarray(sols) - sol[:, None, :], axis=-1)
        d = np.where(np.asarray(valid), d, np.inf)
        assert float(d.min(axis=-1).max()) < 1e-5

    def test_jit_and_vmap(self):
        rng = np.random.default_rng(5)
        coeffs, sol = random_quadric_system(rng, (8,))
        f = jax.jit(lambda c: e3q3.solve_e3q3(c))
        sols, valid = f(jnp.asarray(coeffs))
        d = np.linalg.norm(np.asarray(sols) - sol[:, None, :], axis=-1)
        d = np.where(np.asarray(valid), d, np.inf)
        assert float(d.min(axis=-1).max()) < 1e-6
