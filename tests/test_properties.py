"""Property-based tests (hypothesis): solver contracts on random instances.

Each property mirrors a guarantee the reference encodes in hand-picked
fixtures (SURVEY.md section 4) but checks it across randomized problems:

- STPCG truncation contract: relative residual below kappa_fgr on random SPD
  systems (``IterativeSolvers_unit_test.cpp:254-310`` generalized).
- LSQR agrees with the normal-equations solution on random overdetermined
  systems (within its stopping tolerances).
- ISTA with backtracking never increases the composite objective on random
  LASSO instances (monotone by the Beck-Teboulle majorization; FISTA's
  momentum is legitimately non-monotone), and FISTA reaches an objective at
  least as good.
- TNT gain-ratio acceptance: every accepted step strictly decreases f on
  random convex quadratics.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from optimization_tpu import CompositeProblem, RiemannianProblem
from optimization_tpu.linalg.lsqr import lsqr
from optimization_tpu.linalg.stpcg import stpcg
from optimization_tpu.solvers import proximal_gradient as pg
from optimization_tpu.solvers import tnt
from optimization_tpu.solvers.prox import soft_threshold

inner = lambda u, v: jnp.dot(u, v)

SETTINGS = dict(max_examples=10, deadline=None)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 30),
       kappa=st.sampled_from([0.3, 0.1, 0.01]))
def test_stpcg_truncation_contract(seed, n, kappa):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    H = jnp.asarray(M @ M.T + n * np.eye(n))   # SPD
    g = jnp.asarray(rng.normal(size=n))
    res = stpcg(g, lambda v: H @ v, inner, 1e6,
                max_iterations=10 * n, kappa_fgr=kappa, theta=0.0)
    r = H @ res.s + g
    rel = float(jnp.linalg.norm(r)) / float(jnp.linalg.norm(g))
    assert rel <= kappa * (1 + 1e-9)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), m=st.integers(4, 25),
       n=st.integers(2, 12))
def test_lsqr_matches_normal_equations(seed, m, n):
    if m <= n:
        m = n + 2
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n)) + np.eye(m, n)   # full column rank w.h.p.
    b = rng.normal(size=m)
    xt = np.linalg.lstsq(A, b, rcond=None)[0]
    Aj = jnp.asarray(A)
    res = lsqr(lambda x: Aj @ x, lambda y: Aj.T @ y, jnp.asarray(b),
               inner, max_iterations=20 * n, btol=0.0, Atol=1e-12,
               cond_limit=1e14)
    scale = max(1.0, float(np.linalg.norm(xt)))
    assert float(jnp.linalg.norm(res.x - jnp.asarray(xt))) / scale < 1e-6


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), m=st.integers(4, 20),
       n=st.integers(2, 10))
def test_ista_monotone_and_fista_at_least_as_good(seed, m, n):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(m, n)))
    b = jnp.asarray(rng.normal(size=m))
    mu = 0.1
    problem = CompositeProblem(
        f=lambda x, d: 0.5 * jnp.sum((A @ x - b) ** 2),
        g=lambda x, d: mu * jnp.sum(jnp.abs(x)),
        prox_g=lambda x, lam, d: soft_threshold(x, lam * mu))

    def run(mode):
        params = pg.ProximalGradientParams(
            mode=mode, max_iterations=80, composite_gradient_tolerance=0.0,
            relative_composite_gradient_tolerance=0.0)
        return pg.solve(problem, jnp.zeros(n), params)

    ista = run(pg.ProximalGradientMode.SIMPLE)
    k = int(ista.num_iterations)
    objs = np.asarray(ista.objective_values)[:k]
    # ISTA is monotone up to roundoff (backtracking majorization); FISTA's
    # momentum iteration is legitimately non-monotone.
    assert np.all(np.diff(objs) <= 1e-9 * np.maximum(1.0, np.abs(objs[:-1])))

    fista = run(pg.ProximalGradientMode.ACCELERATED)
    assert float(fista.f) <= float(ista.f) * (1 + 1e-6) + 1e-9


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 20))
def test_tnt_accepted_steps_decrease_f(seed, n):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    H = jnp.asarray(M @ M.T + np.eye(n))
    c = jnp.asarray(rng.normal(size=n))
    problem = RiemannianProblem(
        f=lambda x, d: 0.5 * jnp.dot(x, H @ x) + jnp.dot(c, x))
    params = tnt.TNTParams(max_iterations=50, gradient_tolerance=1e-10,
                           relative_decrease_tolerance=0.0,
                           stepsize_tolerance=0.0,
                           preconditioned_gradient_tolerance=0.0)
    res = tnt.solve(problem, jnp.asarray(rng.normal(size=n)), params)
    k = int(res.num_iterations)
    objs = np.asarray(res.objective_values)[:k + 1]
    objs = objs[~np.isnan(objs)]
    assert np.all(np.diff(objs) <= 1e-12 * np.maximum(1.0, np.abs(objs[:-1])))
    # converged to the unique minimizer
    xt = np.linalg.solve(np.asarray(H), -np.asarray(c))
    np.testing.assert_allclose(np.asarray(res.x), xt, atol=1e-6, rtol=1e-6)
