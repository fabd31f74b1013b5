"""PCG solver unit tests against dense direct solves."""

import jax
import jax.numpy as jnp
import numpy as np

from magnetite_tpu.fem.cg import pcg, pcg_fixed_iterations


def _random_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return a @ a.T + n * np.eye(n)


def test_pcg_solves_spd_system():
    n = 40
    a = _random_spd(n)
    b = np.random.default_rng(1).standard_normal(n)
    result = pcg(lambda x: jnp.asarray(a) @ x, jnp.asarray(b), rtol=1e-12)
    expected = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(result.x), expected, rtol=1e-8)
    assert bool(result.converged)
    assert int(result.iterations) <= n + 5


def test_pcg_with_jacobi_preconditioner_converges_faster():
    n = 80
    # badly scaled diagonal
    d = np.logspace(0, 6, n)
    a = _random_spd(n) + np.diag(d)
    b = np.ones(n)
    plain = pcg(lambda x: jnp.asarray(a) @ x, jnp.asarray(b), rtol=1e-10, maxiter=2000)
    diag = jnp.asarray(np.diag(a))
    pre = pcg(
        lambda x: jnp.asarray(a) @ x,
        jnp.asarray(b),
        preconditioner=lambda r: r / diag,
        rtol=1e-10,
        maxiter=2000,
    )
    assert int(pre.iterations) <= int(plain.iterations)
    np.testing.assert_allclose(
        np.asarray(pre.x), np.linalg.solve(a, b), rtol=1e-6
    )


def test_pcg_respects_maxiter():
    n = 50
    a = _random_spd(n, seed=3)
    b = np.ones(n)
    result = pcg(lambda x: jnp.asarray(a) @ x, jnp.asarray(b), rtol=1e-14, maxiter=3)
    assert int(result.iterations) == 3
    assert not bool(result.converged)


def test_pcg_zero_rhs_returns_zero():
    a = _random_spd(10)
    result = pcg(lambda x: jnp.asarray(a) @ x, jnp.zeros(10), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(result.x), 0.0)
    assert int(result.iterations) == 0


def test_pcg_matrix_shaped_unknowns():
    """PCG operates on [N,2]-shaped fields, not just flat vectors."""
    n = 30
    a = _random_spd(2 * n, seed=5)
    b = np.random.default_rng(2).standard_normal((n, 2))

    def matvec(u):
        return (jnp.asarray(a) @ u.reshape(-1)).reshape(n, 2)

    result = pcg(matvec, jnp.asarray(b), rtol=1e-12)
    expected = np.linalg.solve(a, b.reshape(-1)).reshape(n, 2)
    np.testing.assert_allclose(np.asarray(result.x), expected, rtol=1e-7)


def test_fixed_iteration_pcg_matches_adaptive():
    n = 40
    a = _random_spd(n, seed=7)
    b = np.random.default_rng(3).standard_normal(n)
    fixed = pcg_fixed_iterations(
        lambda x: jnp.asarray(a) @ x, jnp.asarray(b), iterations=n + 10
    )
    expected = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(fixed.x), expected, rtol=1e-7)


def test_pcg_is_jittable_and_vmappable():
    n = 16
    a = _random_spd(n, seed=11)
    bs = np.random.default_rng(4).standard_normal((5, n))

    @jax.jit
    @jax.vmap
    def solve_many(b):
        return pcg_fixed_iterations(
            lambda x: jnp.asarray(a) @ x, b, iterations=n + 5
        ).x

    xs = np.asarray(solve_many(jnp.asarray(bs)))
    expected = np.linalg.solve(a, bs.T).T
    np.testing.assert_allclose(xs, expected, rtol=1e-6)
