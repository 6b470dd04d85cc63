"""Proximal-gradient + ADMM tests.

The reference ships *examples* but no unit tests for these solvers (a gap
SURVEY.md section 4 flags); these tests mirror the examples' problems and add
proper assertions:

- FISTA on the ill-conditioned 2-dim group LASSO of
  ``examples/proximal_gradient_example.cpp`` (A=diag(1000,1), mu=10):
  composite gradient norm < 1e-4.
- ADMM on the Boyd Sec. 11.1 dense LASSO of ``examples/ADMM_example.cpp``
  (x - y = 0 splitting, mu = 0.1 |A'b|_inf): residual-tolerance stop within
  250 iterations at eps_rel = 1e-4; simple and accelerated modes agree with
  the FISTA solution; residual balancing also converges.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_tpu import CompositeProblem
from optimization_tpu.core.types import ADMMStatus, ProximalGradientStatus
from optimization_tpu.solvers import admm, proximal_gradient as pg
from optimization_tpu.solvers.prox import (group_soft_threshold,
                                           soft_threshold)

# ---------------------------------------------------------------- FISTA ----

A2 = jnp.diag(jnp.array([1000.0, 1.0]))
B2 = jnp.array([1.0, 1.0])
MU2 = 10.0

fista_problem = CompositeProblem(
    f=lambda x, d: jnp.sum((A2 @ x - B2) ** 2),
    g=lambda x, d: MU2 * jnp.linalg.norm(x),
    prox_g=lambda x, lam, d: group_soft_threshold(x, MU2 * lam),
)


@pytest.mark.nan_traces
def test_fista_group_lasso():
    params = pg.ProximalGradientParams(
        max_iterations=100000, composite_gradient_tolerance=1e-4)
    res = pg.solve(fista_problem, jnp.array([4.0, 4.0]), params)
    assert int(res.status) == ProximalGradientStatus.PROX_GRAD_RESIDUAL
    k = int(res.num_iterations) - 1
    assert float(res.composite_gradient_norms[k]) < 1e-4 or \
        float(res.relative_composite_gradient_norms[k]) < 1e-3


@pytest.mark.nan_traces
def test_ista_matches_fista():
    # Milder conditioning than the headline example so plain ISTA can reach
    # the tolerance in a bounded iteration budget.
    A = jnp.diag(jnp.array([20.0, 1.0]))
    b = jnp.array([1.0, 1.0])
    mu = 1.0
    problem = CompositeProblem(
        f=lambda x, d: jnp.sum((A @ x - b) ** 2),
        g=lambda x, d: mu * jnp.linalg.norm(x),
        prox_g=lambda x, lam, d: group_soft_threshold(x, mu * lam),
    )
    p_acc = pg.ProximalGradientParams(
        max_iterations=200000, composite_gradient_tolerance=1e-6,
        relative_composite_gradient_tolerance=1e-8)
    p_simple = dataclasses.replace(p_acc, mode=pg.ProximalGradientMode.SIMPLE)
    x0 = jnp.array([4.0, 4.0])
    r1 = pg.solve(problem, x0, p_acc)
    r2 = pg.solve(problem, x0, p_simple)
    assert int(r1.status) == ProximalGradientStatus.PROX_GRAD_RESIDUAL
    assert int(r2.status) == ProximalGradientStatus.PROX_GRAD_RESIDUAL
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-4)


# ----------------------------------------------------------------- ADMM ----

def _lasso_setup(m=300, n=800, nnz=20, seed=11):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    A /= np.linalg.norm(A, axis=0, keepdims=True)
    x_true = np.zeros(n)
    idx = rng.integers(0, n, nnz)
    x_true[idx] = rng.normal(size=nnz)
    b = A @ x_true + rng.normal(size=m)
    Atb = A.T @ b
    mu = 0.1 * np.abs(Atb).max()
    return jnp.asarray(A), jnp.asarray(b), jnp.asarray(Atb), float(mu)


def _lasso_admm_problem(A, Atb, mu):
    n = A.shape[1]
    AtA = A.T @ A

    def minLx(y, lam, rho, data):
        # x = (A'A + rho I)^{-1} (A'b + rho y - lambda)  (ADMM_example.cpp:115-141)
        return jax.scipy.linalg.solve(
            AtA + rho * jnp.eye(n), Atb + rho * y - lam, assume_a="pos")

    def minLy(x, lam, rho, data):
        # Soft thresholding with threshold mu/rho (ADMM_example.cpp ~ y-update)
        return soft_threshold(x + lam / rho, mu / rho)

    return admm.ADMMProblem(
        minLx=minLx, minLy=minLy,
        A=lambda x, d: x,
        B=lambda y, d: -y,
        At=lambda r, d: r,
    )


ADMM_PARAMS = admm.ADMMParams(
    max_iterations=250, eps_rel=1e-4, eps_abs_pri=1e-2, eps_abs_dual=1e-2)


def _fista_reference_solution(A, b, mu):
    problem = CompositeProblem(
        f=lambda x, d: 0.5 * jnp.sum((A @ x - b) ** 2),
        g=lambda x, d: mu * jnp.sum(jnp.abs(x)),
        prox_g=lambda x, lam, d: soft_threshold(x, mu * lam),
    )
    params = pg.ProximalGradientParams(
        max_iterations=20000, composite_gradient_tolerance=1e-7,
        relative_composite_gradient_tolerance=1e-9)
    return pg.solve(problem, jnp.zeros(A.shape[1]), params).x


@pytest.mark.nan_traces
def test_admm_lasso():
    A, b, Atb, mu = _lasso_setup()
    problem = _lasso_admm_problem(A, Atb, mu)
    n = A.shape[1]
    res = admm.solve(problem, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                     ADMM_PARAMS)
    assert int(res.status) == ADMMStatus.RESIDUAL_TOLERANCE
    assert int(res.num_iterations) <= 250
    # Primal/dual residual traces are finite and decreasing overall
    k = int(res.num_iterations)
    assert np.isfinite(np.asarray(res.primal_residuals[:k])).all()
    # Solution quality: objective close to a tight FISTA solve
    x_ref = _fista_reference_solution(A, b, mu)
    obj = lambda x: float(0.5 * jnp.sum((A @ x - b) ** 2)
                          + mu * jnp.sum(jnp.abs(x)))
    assert obj(res.y) <= obj(x_ref) * 1.01 + 1e-6


@pytest.mark.nan_traces
def test_admm_accelerated():
    A, b, Atb, mu = _lasso_setup()
    problem = _lasso_admm_problem(A, Atb, mu)
    n = A.shape[1]
    params = admm.ADMMParams(
        max_iterations=250, eps_rel=1e-4, eps_abs_pri=1e-2,
        eps_abs_dual=1e-2, mode=admm.ADMMMode.ACCELERATED)
    res = admm.solve(problem, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), params)
    assert int(res.status) == ADMMStatus.RESIDUAL_TOLERANCE
    x_ref = _fista_reference_solution(A, b, mu)
    obj = lambda x: float(0.5 * jnp.sum((A @ x - b) ** 2)
                          + mu * jnp.sum(jnp.abs(x)))
    assert obj(res.y) <= obj(x_ref) * 1.01 + 1e-6
    # Iteration-type trace uses valid codes
    k = int(res.num_iterations)
    assert set(np.asarray(res.iteration_types[:k])) <= {0, 1, 2}


@pytest.mark.nan_traces
def test_admm_residual_balancing():
    A, b, Atb, mu = _lasso_setup()
    problem = _lasso_admm_problem(A, Atb, mu)
    n = A.shape[1]
    params = admm.ADMMParams(
        max_iterations=250, eps_rel=1e-4, eps_abs_pri=1e-2,
        eps_abs_dual=1e-2,
        penalty_adaptation_mode=admm.ADMMPenaltyAdaptation.RESIDUAL_BALANCE,
        penalty_adaptation_period=2, penalty_adaptation_window=100)
    res = admm.solve(problem, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), params)
    assert int(res.status) == ADMMStatus.RESIDUAL_TOLERANCE


# -------------------------------------------------------------- prox ops ---

def test_prox_operators():
    x = jnp.array([3.0, -0.5, 0.2])
    np.testing.assert_allclose(np.asarray(soft_threshold(x, 1.0)),
                               [2.0, 0.0, 0.0])
    # Group soft threshold shrinks the norm by lam
    y = group_soft_threshold(x, 1.0)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(y)),
        float(jnp.linalg.norm(x)) - 1.0, rtol=1e-12)
