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


def test_fista_group_lasso():
    params = pg.ProximalGradientParams(
        max_iterations=100000, composite_gradient_tolerance=1e-4)
    res = pg.solve(fista_problem, jnp.array([4.0, 4.0]), params)
    assert int(res.status) == ProximalGradientStatus.PROX_GRAD_RESIDUAL
    k = int(res.num_iterations) - 1
    assert float(res.composite_gradient_norms[k]) < 1e-4 or \
        float(res.relative_composite_gradient_norms[k]) < 1e-3


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


# ----------------------------------------------- user callbacks (round 5) --

def test_pg_user_function_stops_and_matches_reference_state():
    """Terminating user_function on proximal gradient (the jittable analog
    of ``ProximalGradientUserFunction``, ``ProximalGradient.h:45-49``): a
    stop at k == K leaves the iterate where a K-iteration solve leaves it
    (the stop fires before the update is applied), sets USER_FUNCTION, and
    the callback's (F, G_lambda, linesearch_iters, dx, dF) state matches
    the result traces."""
    params = pg.ProximalGradientParams(
        max_iterations=50, composite_gradient_tolerance=1e-12,
        relative_composite_gradient_tolerance=1e-14)
    x0 = jnp.array([4.0, 4.0])
    K = 5

    seen = {}

    def user_fn(k, x, F, G, ls_iters, dx, dF):
        # jittable observation through host-side dict is NOT allowed inside
        # jit; this predicate only uses traced values.  The state parity is
        # asserted via the traces below.
        return k == K

    res = pg.solve(fista_problem, x0, params, user_function=user_fn)
    assert int(res.status) == ProximalGradientStatus.USER_FUNCTION
    assert int(res.num_iterations) == K + 1

    # the K-th iteration's update was NOT applied: x equals a K-iteration run
    params_K = dataclasses.replace(params, max_iterations=K)
    res_K = pg.solve(fista_problem, x0, params_K)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(res_K.x))

    # linesearch trace: recorded per iteration, finite int counts
    ls = np.asarray(res.linesearch_iterations[:K + 1])
    assert (ls >= 0).all()
    # dx: the last APPLIED update step (iteration K was not applied, so the
    # result's dx is iteration K-1's step x_{K-1} - x_{K-2}).  The iterate
    # trace records x BEFORE iteration k (it[k] = x_{k-1}), so x_{K-2} is
    # it[K-1] and x_{K-1} is the K-iteration run's final x.
    params_log = dataclasses.replace(params, max_iterations=K,
                                     log_iterates=True)
    res_log = pg.solve(fista_problem, x0, params_log)
    it = np.asarray(res_log.iterates)
    np.testing.assert_allclose(np.asarray(res.dx),
                               np.asarray(res_K.x) - it[K - 1],
                               rtol=1e-12, atol=1e-12)


def test_pg_linesearch_iterations_traced():
    """With an optimistic Lipschitz estimate the backtracking line search
    must record nonzero counts (the reference callback's
    ``linesearch_iters``)."""
    params = pg.ProximalGradientParams(
        max_iterations=30, L=1e-4, composite_gradient_tolerance=1e-12,
        relative_composite_gradient_tolerance=1e-14)
    res = pg.solve(fista_problem, jnp.array([4.0, 4.0]), params)
    k = int(res.num_iterations)
    ls = np.asarray(res.linesearch_iterations[:k])
    assert ls.max() > 0
    # without linesearch the counts are identically zero
    params_nols = dataclasses.replace(params, L=4e6, linesearch=False)
    res2 = pg.solve(fista_problem, jnp.array([4.0, 4.0]), params_nols)
    assert np.all(np.asarray(
        res2.linesearch_iterations[:int(res2.num_iterations)]) == 0)


def test_pg_observer_chunk1_sees_reference_callback_state():
    """Driver observer at chunk_iterations=1 recovers the reference
    per-iteration callback state: dx per iteration equals the difference of
    consecutive logged iterates, linesearch counts match the monolithic
    trace."""
    from optimization_tpu.core import driver

    params = pg.ProximalGradientParams(
        max_iterations=8, composite_gradient_tolerance=1e-12,
        relative_composite_gradient_tolerance=1e-14)
    x0 = jnp.array([4.0, 4.0])

    seen = []

    def obs(total, r, t):
        seen.append((total, np.asarray(r.dx),
                     int(r.linesearch_iterations[0]),
                     float(r.composite_gradient_norms[0]), t))

    res = driver.drive(pg, fista_problem, x0, params, chunk_iterations=1,
                       observer=obs)
    assert len(seen) == 8

    mono = pg.solve(fista_problem, x0, dataclasses.replace(
        params, log_iterates=True))
    # the iterate trace records x BEFORE iteration k (it[k] = x_{k-1},
    # it[0] = x0); iteration k's dx is x_k - x_{k-1}
    it = np.asarray(mono.iterates)
    xs_after = np.concatenate([it[1:8], np.asarray(mono.x)[None]])
    for k, (total, dx, ls, g, t) in enumerate(seen):
        assert total == k + 1
        np.testing.assert_allclose(dx, xs_after[k] - it[k],
                                   rtol=1e-10, atol=1e-12)
        assert ls == int(mono.linesearch_iterations[k])
        np.testing.assert_allclose(
            g, float(mono.composite_gradient_norms[k]), rtol=1e-10)
        assert t >= 0.0  # the host supplies the reference callback's t


def test_admm_user_function_stops_and_exposes_residual_vectors():
    """Terminating user_function on ADMM (the jittable analog of
    ``ADMMUserFunction``, ``ADMM.h:71-76``): end-of-iteration state, the
    residual VECTORS r/s consistent with the recorded norms, USER_FUNCTION
    status, and chunk=1 observer parity for r/s."""
    A, b, Atb, mu = _lasso_setup(m=60, n=40)
    problem = _lasso_admm_problem(A, Atb, mu)
    n = A.shape[1]
    K = 4

    def user_fn(k, x, y, lam, rho, r, s):
        return k == K

    params = dataclasses.replace(ADMM_PARAMS, eps_rel=1e-12,
                                 eps_abs_pri=1e-12, eps_abs_dual=1e-12)
    res = admm.solve(problem, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                     params, user_function=user_fn)
    assert int(res.status) == ADMMStatus.USER_FUNCTION
    assert int(res.num_iterations) == K + 1

    # the exposed vectors' norms equal the recorded residual norms
    np.testing.assert_allclose(
        float(jnp.linalg.norm(res.r)), float(res.primal_residuals[K]),
        rtol=1e-12)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(res.s)), float(res.dual_residuals[K]),
        rtol=1e-12)

    # chunk=1 observer sees r/s per iteration, matching the monolithic traces
    from optimization_tpu.core import driver

    seen = []
    params8 = dataclasses.replace(params, max_iterations=6)
    driver.drive_admm(problem, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                      params8, chunk_iterations=1,
                      observer=lambda total, r, t: seen.append(
                          (total, float(jnp.linalg.norm(r.r)),
                           float(jnp.linalg.norm(r.s)))))
    mono = admm.solve(problem, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                      params8)
    assert len(seen) == 6
    for k, (total, rn, sn) in enumerate(seen):
        assert total == k + 1
        np.testing.assert_allclose(rn, float(mono.primal_residuals[k]),
                                   rtol=1e-10)
        np.testing.assert_allclose(sn, float(mono.dual_residuals[k]),
                                   rtol=1e-10)


def test_admm_accelerated_user_function_s_held_over_restart():
    """In accelerated mode the exposed dual-residual vector is held over
    restart iterations exactly like its recorded norm (``ADMM.h:461-468``)."""
    A, b, Atb, mu = _lasso_setup(m=60, n=40)
    problem = _lasso_admm_problem(A, Atb, mu)
    n = A.shape[1]
    params = dataclasses.replace(
        ADMM_PARAMS, mode=admm.ADMMMode.ACCELERATED, max_iterations=40,
        eps_rel=1e-12, eps_abs_pri=1e-12, eps_abs_dual=1e-12)
    res = admm.solve(problem, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                     params)
    k = int(res.num_iterations)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(res.s)), float(res.dual_residuals[k - 1]),
        rtol=1e-12)


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
