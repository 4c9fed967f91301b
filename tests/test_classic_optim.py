"""Functional CG / Gauss-Newton / GD solvers vs closed-form solutions."""
import numpy as np
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.classic.optimization import (
    conjugate_gradient, gauss_newton_cg, gradient_descent_l2,
    solve_normal_equations, steepest_descent_quadratic)


def _spd(n, seed):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    return (M @ M.T + n * np.eye(n)).astype(np.float32)


def test_cg_solves_spd_system():
    A = _spd(12, 0)
    b = np.random.default_rng(1).standard_normal(12).astype(np.float32)
    res = jax.jit(lambda b: conjugate_gradient(lambda x: jnp.asarray(A) @ x,
                                               b, num_iter=12))(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               rtol=1e-3, atol=1e-3)
    # residual trace decreases
    t = np.asarray(res.residual_norms)
    assert t[-1] < t[0]


def test_cg_over_pytree():
    A1, A2 = _spd(5, 2), _spd(7, 3)
    b = {"a": jnp.ones(5), "b": 2.0 * jnp.ones(7)}
    res = conjugate_gradient(
        lambda x: {"a": jnp.asarray(A1) @ x["a"], "b": jnp.asarray(A2) @ x["b"]},
        b, num_iter=10)
    np.testing.assert_allclose(np.asarray(res.x["a"]),
                               np.linalg.solve(A1, np.ones(5)), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.x["b"]),
                               np.linalg.solve(A2, 2 * np.ones(7)), rtol=1e-3, atol=1e-3)


def test_normal_equations_linear_least_squares():
    rng = np.random.default_rng(4)
    J = rng.standard_normal((20, 6)).astype(np.float32)
    y = rng.standard_normal(20).astype(np.float32)
    x = solve_normal_equations(lambda x: jnp.asarray(J) @ x - jnp.asarray(y),
                               jnp.zeros(6), num_iter=12)
    expected, *_ = np.linalg.lstsq(J, y, rcond=None)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-3, atol=1e-3)


def test_normal_equations_complex_least_squares():
    """Complex leaves need the HERMITIAN adjoint: jax.vjp of a holomorphic
    map returns the unconjugated transpose J^T, so solve_normal_equations
    conj-wraps it (regression: the raw transpose makes CG solve a
    non-Hermitian system that never descends — the ECO factorized-conv
    init shipped with that bug)."""
    rng = np.random.default_rng(5)
    Z = jnp.asarray(rng.standard_normal((12, 5)) +
                    1j * rng.standard_normal((12, 5)), jnp.complex64)
    y = jnp.asarray(rng.standard_normal(12) +
                    1j * rng.standard_normal(12), jnp.complex64)
    x = solve_normal_equations(lambda x: Z @ x - y,
                               jnp.zeros(5, jnp.complex64), num_iter=20)
    expected, *_ = np.linalg.lstsq(np.asarray(Z), np.asarray(y), rcond=None)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-3, atol=1e-3)


def test_normal_equations_mixed_real_complex_tree():
    """Bilinear-style mixed pytree (complex filter + real matrix): the joint
    solve must minimise the true real objective."""
    rng = np.random.default_rng(6)
    Z = jnp.asarray(rng.standard_normal((30, 4)) +
                    1j * rng.standard_normal((30, 4)), jnp.complex64)
    y = jnp.asarray(rng.standard_normal(30) +
                    1j * rng.standard_normal(30), jnp.complex64)
    M = jnp.asarray(rng.standard_normal((30, 3)), jnp.float32)
    t = jnp.asarray(rng.standard_normal(30), jnp.float32)

    def residual(v):
        return {"c": Z @ v["f"] - y, "r": M @ v["p"] - t}

    v = solve_normal_equations(residual,
                               {"f": jnp.zeros(4, jnp.complex64),
                                "p": jnp.zeros(3, jnp.float32)}, num_iter=30)
    ef, *_ = np.linalg.lstsq(np.asarray(Z), np.asarray(y), rcond=None)
    ep, *_ = np.linalg.lstsq(np.asarray(M), np.asarray(t), rcond=None)
    np.testing.assert_allclose(np.asarray(v["f"]), ef, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v["p"]), ep, rtol=1e-3, atol=1e-3)


def test_gauss_newton_nonlinear():
    """Fit exp(a*t) to data: GN converges from a nearby start."""
    t = jnp.linspace(0, 1, 16)
    y = jnp.exp(0.7 * t)
    x = gauss_newton_cg(lambda a: jnp.exp(a * t) - y, jnp.asarray(0.2),
                        num_gn_iter=6, num_cg_iter=4)
    assert abs(float(x) - 0.7) < 1e-3


def test_gradient_descent_l2():
    A = _spd(6, 5)
    b = np.random.default_rng(6).standard_normal(6).astype(np.float32)
    loss = lambda x: 0.5 * x @ jnp.asarray(A) @ x - jnp.asarray(b) @ x
    x = gradient_descent_l2(loss, jnp.zeros(6), num_iter=400,
                            step_length=1.0 / np.linalg.eigvalsh(A).max(),
                            momentum=0.9)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-2, atol=1e-2)


def test_steepest_descent_quadratic():
    A = _spd(8, 7)
    b = np.random.default_rng(8).standard_normal(8).astype(np.float32)
    x = steepest_descent_quadratic(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                                   jnp.zeros(8), num_iter=60)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-2, atol=1e-2)


def test_hann1d_uncentered_matches_pytracking():
    """pytracking dcf.py hann1d(centered=False) uses denominator (sz+2);
    an (sz+1) port deviates by up to 0.10 at sz=8."""
    import math

    from multi_modal_tracking_tpu.classic.dcf import hann1d

    for n in (8, 9, 16, 17):
        w = 0.5 * (1 + np.cos((2 * math.pi / (n + 2)) * np.arange(0, n // 2 + 1)))
        want = np.concatenate([w, w[1:n - n // 2][::-1]])
        np.testing.assert_allclose(np.asarray(hann1d(n, centered=False)),
                                   want, rtol=1e-6)
        assert len(want) == n
