"""Functional optimization library over pytrees.

Parity target: external/AR/pytracking/libs/optimization.py —
ConjugateGradientBase.run_CG (:72-163, standard PCG with an optional
forgetting factor on rho), ConjugateGradient (:199, solves the normal
equations J^T J x = J^T f via autograd jvp/vjp), GaussNewtonCG (:293-435,
outer Gauss-Newton linearisation + inner CG), GradientDescentL2 (:438-530).

TPU-first redesign: the reference mutates TensorLists in Python loops; here
each solver is a pure function over arbitrary pytrees using `jax.lax.scan`
for the iteration so the WHOLE optimization (including every matrix-vector
product through `jvp`/`vjp`) compiles to one XLA program. Residual problems
are plain callables r(x); Jacobian products come from jax.jvp / jax.vjp
instead of the reference's `torch.autograd.grad(..., create_graph=True)`
double-backward trick.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

Pytree = Any


def _dot(a: Pytree, b: Pytree) -> jax.Array:
    leaves_a, leaves_b = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    return sum(jnp.vdot(x, y).real for x, y in zip(leaves_a, leaves_b))


def _axpy(alpha, x: Pytree, y: Pytree) -> Pytree:
    return jax.tree_util.tree_map(lambda u, v: alpha * u + v, x, y)


def _scale(alpha, x: Pytree) -> Pytree:
    return jax.tree_util.tree_map(lambda u: alpha * u, x)


class CGResult(NamedTuple):
    x: Pytree
    residual_norms: jax.Array   # (num_iter + 1,) ||r||^2 trace


def conjugate_gradient(A: Callable[[Pytree], Pytree], b: Pytree,
                       x0: Optional[Pytree] = None, num_iter: int = 10,
                       forgetting_rate: Optional[float] = None,
                       precond: Optional[Callable[[Pytree], Pytree]] = None,
                       eps: float = 0.0) -> CGResult:
    """Preconditioned CG for A x = b over pytrees (run_CG :72-163).

    `forgetting_rate` reproduces the reference's `fletcher_reeves=False` +
    direction-forgetting variant used by the online trackers; None gives
    standard Fletcher-Reeves PCG. Fixed iteration count (static for XLA);
    `eps` guards rho==0 without data-dependent early exit.
    """
    if x0 is None:
        x = jax.tree_util.tree_map(jnp.zeros_like, b)
        r = b
    else:
        x = x0
        r = jax.tree_util.tree_map(lambda u, v: u - v, b, A(x0))
    M = precond if precond is not None else (lambda t: t)

    z = M(r)
    p = z
    rho = _dot(r, z)

    def body(carry, _):
        x, r, p, rho = carry
        Ap = A(p)
        pAp = _dot(p, Ap)
        alpha = jnp.where(pAp > eps, rho / jnp.maximum(pAp, 1e-30), 0.0)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        z = M(r)
        rho_new = _dot(r, z)
        if forgetting_rate is None:
            beta = rho_new / jnp.maximum(rho, 1e-30)
        else:
            # Polak-Ribiere-style with forgetting (reference :124-141)
            beta = rho_new / jnp.maximum(forgetting_rate * rho, 1e-30)
        beta = jnp.where(rho > eps, beta, 0.0)
        p = _axpy(beta, p, z)
        return (x, r, p, rho_new), rho_new

    (x, r, p, rho), trace = jax.lax.scan(body, (x, r, p, rho),
                                         None, length=num_iter)
    return CGResult(x=x, residual_norms=trace)


def solve_normal_equations(residual_fn: Callable[[Pytree], Pytree], x: Pytree,
                           num_iter: int = 10, reg: Optional[Any] = None,
                           precond: Optional[Callable[[Pytree], Pytree]] = None
                           ) -> Pytree:
    """ConjugateGradient (:199-290): minimise ||r(x + dx)||^2 in the
    linearisation r(x) + J dx  ==>  solve (J^T J + reg I) dx = -J^T r(x),
    returning the updated x + dx.

    J-products via jvp (forward) and vjp (reverse) exactly where the
    reference uses torch.autograd.grad twice (:278-291). `precond` is the M1
    preconditioner applied inside CG (reference Problem.M1).

    Complex leaves: jax.vjp of a holomorphic map returns the UNCONJUGATED
    transpose J^T w, but least squares needs the Hermitian adjoint
    J^H w = conj(J^T conj(w)) — so every vjp call is conj-wrapped (a no-op
    on real leaves). Without this the "normal equations" are non-Hermitian
    and CG stalls (caught on the ECO factorized-conv init).
    """
    r0, vjp_fn = jax.vjp(residual_fn, x)
    _conj = functools.partial(jax.tree_util.tree_map, jnp.conj)

    def JH(w):
        (out,) = vjp_fn(_conj(w))
        return _conj(out)

    def A(dx):
        _, Jdx = jax.jvp(residual_fn, (x,), (dx,))
        JtJdx = JH(Jdx)
        if reg is not None:                 # Levenberg damping (may be traced)
            JtJdx = _axpy(reg, dx, JtJdx)
        return JtJdx

    neg_Jtr = JH(jax.tree_util.tree_map(lambda u: -u, r0))
    res = conjugate_gradient(A, neg_Jtr, num_iter=num_iter, precond=precond)
    return jax.tree_util.tree_map(lambda u, v: u + v, x, res.x)


def gauss_newton_cg(residual_fn: Callable[[Pytree], Pytree], x0: Pytree,
                    num_gn_iter: int = 3, num_cg_iter: int = 5,
                    reg: Optional[Any] = None,
                    precond: Optional[Callable[[Pytree], Pytree]] = None
                    ) -> Pytree:
    """GaussNewtonCG (:293-435): outer re-linearisation loop around the CG
    normal-equation solve. Both loops are static-length; the whole nest jits
    to one program (the reference re-enters Python per GN iteration)."""
    def gn_step(x, _):
        x = solve_normal_equations(residual_fn, x, num_iter=num_cg_iter,
                                   reg=reg, precond=precond)
        return x, None

    x, _ = jax.lax.scan(gn_step, x0, None, length=num_gn_iter)
    return x


def gradient_descent_l2(loss_fn: Callable[[Pytree], jax.Array], x0: Pytree,
                        num_iter: int = 10, step_length: float = 1.0,
                        momentum: float = 0.0) -> Pytree:
    """GradientDescentL2 (:438-530): plain GD with heavy-ball momentum on a
    scalar L2 loss."""
    grad_fn = jax.grad(loss_fn)

    def body(carry, _):
        x, v = carry
        g = grad_fn(x)
        v = _axpy(momentum, v, g)          # v = g + momentum * v
        x = _axpy(-step_length, v, x)
        return (x, v), None

    v0 = jax.tree_util.tree_map(jnp.zeros_like, x0)
    (x, _), _ = jax.lax.scan(body, (x0, v0), None, length=num_iter)
    return x


def steepest_descent_quadratic(A: Callable[[Pytree], Pytree], b: Pytree,
                               x0: Pytree, num_iter: int = 5) -> Pytree:
    """Steepest descent with exact line search on 0.5 x^T A x - b^T x.

    Generic solver of the CG library (reference
    external/AR/pytracking/libs/optimization.py ships the same family of
    stand-alone solvers). NOT on the production DiMP path: the tracker uses
    the learned DiMPSteepestDescentGN module (classic/dimpnet.py), which
    computes the same alpha = r^T r / r^T A r step with learned weights."""
    def body(x, _):
        r = jax.tree_util.tree_map(lambda u, v: u - v, b, A(x))
        Ar = A(r)
        alpha = _dot(r, r) / jnp.maximum(_dot(r, Ar), 1e-30)
        return _axpy(alpha, r, x), None

    x, _ = jax.lax.scan(body, x0, None, length=num_iter)
    return x
