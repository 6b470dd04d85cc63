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
import pytest
from hypothesis import given, settings, strategies as st

from optimization_tpu import CompositeProblem, RiemannianProblem
from optimization_tpu.linalg.lsqr import lsqr
from optimization_tpu.linalg.stpcg import stpcg
from optimization_tpu.solvers import proximal_gradient as pg
from optimization_tpu.solvers import tnt
from optimization_tpu.solvers.prox import soft_threshold

# Hypothesis property sweeps are the heavyweight tier; the contract/unit
# suite stays under the fast -m "not slow" tier (CLAUDE.md).
pytestmark = pytest.mark.slow

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


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(8, 60),
       rank=st.integers(0, 3),
       delta=st.sampled_from([1e6, 1.0, 0.1]),
       indefinite=st.booleans(),
       s_steps=st.sampled_from([1, 2, 3]))
def test_flat_cg_matches_generic_stpcg(seed, n, rank, delta, indefinite,
                                       s_steps):
    """Property: the s-step single-synchronization flat engine reproduces
    the generic STPCG engine — identical iteration counts and matching
    steps — on random diag + low-rank (possibly indefinite) operators
    across interior/boundary/negative-curvature regimes, at every group
    size s (multi-step groups demote to honest single steps around every
    exit, so the committed iterate sequence is identical)."""
    from optimization_tpu.linalg.flat_cg import stpcg_flat

    rng = np.random.default_rng(seed)
    lo = -2.0 if indefinite else 0.5
    d = jnp.asarray(rng.uniform(lo, 30.0, n))
    g = jnp.asarray(rng.normal(size=n))
    A0 = lambda v: d * v
    if rank:
        Um = jnp.asarray(rng.normal(size=(n, rank)) / np.sqrt(n))
        U = tuple(Um[:, j] for j in range(rank))
        Bm = jnp.asarray(rng.normal(size=(rank, rank)))
        B = 0.5 * (Bm + Bm.T)
        Hv = lambda v: A0(v) + Um @ (B @ (Um.T @ v))
    else:
        U, B = None, None
        Hv = A0

    ref = stpcg(g, Hv, inner, delta, max_iterations=5 * n,
                kappa_fgr=0.05, theta=0.5)
    res = stpcg_flat(g, A0, U, B, delta, max_iterations=5 * n,
                     kappa_fgr=0.05, theta=0.5, s_steps=s_steps)
    assert int(res.num_iterations) == int(ref.num_iterations)
    np.testing.assert_allclose(float(res.update_step_M_norm),
                               float(ref.update_step_M_norm),
                               rtol=1e-6, atol=1e-10)
    scale = max(float(jnp.linalg.norm(ref.s)), 1e-9)
    np.testing.assert_allclose(np.asarray(res.s), np.asarray(ref.s),
                               atol=1e-5 * scale)
    # predicted model decrease equals the explicit evaluation
    dm = float(-jnp.dot(g, res.s) - 0.5 * jnp.dot(res.s, Hv(res.s)))
    np.testing.assert_allclose(float(res.predicted_decrease), dm,
                               rtol=1e-5, atol=1e-9 * max(abs(dm), 1.0))


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 48),
       logkappa=st.floats(0.0, 6.0))
def test_chol_rr_matches_eigh_rr(seed, n, logkappa):
    """Property: on any well-posed SPD pencil (kappa(B) up to 1e6) the
    shifted-Cholesky Rayleigh-Ritz reproduces the robust eigh path's Ritz
    values and B-orthonormality to f64 working accuracy."""
    from optimization_tpu.linalg.lobpcg import (_rayleigh_ritz_chol,
                                                rayleigh_ritz)
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.logspace(0.0, logkappa, n)
    B = (q * lam) @ q.T
    A = rng.standard_normal((n, n))
    A = A + A.T
    td, _ = rayleigh_ritz(jnp.asarray(A), jnp.asarray(B))
    tc, Cc, ok = _rayleigh_ritz_chol(jnp.asarray(A), jnp.asarray(B))
    assert bool(ok)
    scale = np.max(np.abs(np.asarray(td)))
    np.testing.assert_allclose(np.asarray(tc), np.asarray(td),
                               atol=1e-8 * max(scale, 1.0), rtol=1e-8)
    G = np.asarray(Cc).T @ B @ np.asarray(Cc)
    np.testing.assert_allclose(G, np.eye(n), atol=1e-8)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(8, 60),
       rank=st.integers(0, 3),
       delta=st.sampled_from([1e6, 1.0, 0.1]),
       logcond=st.floats(0.5, 5.0),
       s_steps=st.sampled_from([1, 2]))
def test_flat_cg_preconditioned_matches_generic(seed, n, rank, delta,
                                                logcond, s_steps):
    """Property: the flat engine's symmetric-folding prec= seam reproduces
    the generic engine's preconditioned STPCG (M = D Jacobi) — identical
    iteration counts, matching steps, and the M-norm reported as the step
    norm — across SPD spectra of varying conditioning, low-rank terms, and
    interior/boundary regimes (reference IterativeSolvers.h:236-291,
    388-420)."""
    from optimization_tpu.linalg.flat_cg import stpcg_flat

    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.uniform(1.0, 10.0 ** logcond, n))
    g = jnp.asarray(rng.normal(size=n))
    A0 = lambda v: d * v
    if rank:
        Um = jnp.asarray(rng.normal(size=(n, rank)) / np.sqrt(n))
        U = tuple(Um[:, j] for j in range(rank))
        Bm = jnp.asarray(rng.normal(size=(rank, rank)))
        B = 0.5 * (Bm + Bm.T)
        Hv = lambda v: A0(v) + Um @ (B @ (Um.T @ v))
    else:
        U, B = None, None
        Hv = A0

    prec = lambda v: v * jax.lax.rsqrt(d)
    gen_precon = lambda r: (r / d, None)

    ref = stpcg(g, Hv, inner, delta, max_iterations=5 * n,
                kappa_fgr=0.05, theta=0.5, precon=gen_precon)
    res = stpcg_flat(g, A0, U, B, delta, max_iterations=5 * n,
                     kappa_fgr=0.05, theta=0.5, s_steps=s_steps, prec=prec)
    assert int(res.num_iterations) == int(ref.num_iterations)
    np.testing.assert_allclose(float(res.update_step_M_norm),
                               float(ref.update_step_M_norm),
                               rtol=1e-6, atol=1e-10)
    scale = max(float(jnp.linalg.norm(ref.s)), 1e-9)
    np.testing.assert_allclose(np.asarray(res.s), np.asarray(ref.s),
                               atol=1e-5 * scale)
