"""Low-rank matrix completion (RTRMC-style) on the Grassmann manifold.

The model family check: TNT on Gr(m, k) with the batched inner ridge solve
recovers a rank-k matrix from partial observations — exact on noiseless
data, noise-floor accurate on noisy data, and the autodiff gradient matches
the envelope-theorem closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_tpu.core.types import TNTStatus
from optimization_tpu.models import matrix_completion as mc
from optimization_tpu.solvers import tnt


def _params(gtol=1e-10, iters=100):
    return tnt.TNTParams(
        max_iterations=iters, gradient_tolerance=gtol,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0, max_TPCG_iterations=200)


@pytest.mark.slow
def test_exact_recovery_noiseless():
    m, n, k = 60, 50, 3
    M_true, data = mc.random_instance(jax.random.PRNGKey(0), m, n, k,
                                      frac=0.5, lam=1e-10)
    U0 = mc.spectral_init(data, k)
    res = tnt.solve(mc.make_problem(), U0, _params(), data=data)
    M_hat = mc.predict(res.x, data)
    # exact recovery: unobserved entries too
    err = float(jnp.linalg.norm(M_hat - M_true) / jnp.linalg.norm(M_true))
    assert err < 1e-6, err
    # f retains the lam/2 |W|^2 ridge bias and the gradient-tolerance residual
    assert float(res.f) < 1e-6


@pytest.mark.slow
def test_noisy_recovery_at_noise_floor():
    m, n, k, noise = 80, 70, 4, 0.01
    M_true, data = mc.random_instance(jax.random.PRNGKey(3), m, n, k,
                                      frac=0.4, noise=noise, lam=1e-8)
    U0 = mc.spectral_init(data, k)
    res = tnt.solve(mc.make_problem(), U0, _params(gtol=1e-8), data=data)
    M_hat = mc.predict(res.x, data)
    rel = float(jnp.linalg.norm(M_hat - M_true) / jnp.linalg.norm(M_true))
    # RMSE over ALL entries at the observation-noise scale
    assert rel < 5 * noise, rel
    assert int(res.status) in (TNTStatus.GRADIENT, TNTStatus.STEPSIZE,
                               TNTStatus.TRUST_REGION)


def test_gradient_matches_envelope_form():
    """Autodiff through the batched inner solve == the envelope-theorem
    partial gradient  proj(P_Omega(UW - M) W')."""
    m, n, k = 30, 25, 3
    _, data = mc.random_instance(jax.random.PRNGKey(5), m, n, k, frac=0.6,
                                 noise=0.05, lam=1e-3)
    problem = mc.make_problem()
    U = mc.spectral_init(data, k)

    g_auto = problem.rgrad(U, data)
    W = mc.solve_W(U, data)
    R = data.mask * (U @ W - data.M_obs)
    g_env = problem.manifold.proj(U, R @ W.T)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_env),
                               atol=1e-9)


def test_inner_solve_is_columnwise_ridge():
    m, n, k = 20, 8, 3
    _, data = mc.random_instance(jax.random.PRNGKey(7), m, n, k, frac=0.7,
                                 lam=0.1)
    U = mc.spectral_init(data, k)
    W = mc.solve_W(U, data)
    for j in range(n):
        D = np.diag(np.asarray(data.mask[:, j]))
        A = np.asarray(U).T @ D @ np.asarray(U) + 0.1 * np.eye(k)
        b = np.asarray(U).T @ D @ np.asarray(data.M_obs[:, j])
        np.testing.assert_allclose(np.asarray(W[:, j]),
                                   np.linalg.solve(A, b), atol=1e-10)


@pytest.mark.slow
def test_vmapped_fleet():
    """A fleet of completion instances under vmap (DP-shardable)."""
    B, m, n, k = 3, 40, 30, 2
    keys = jax.random.split(jax.random.PRNGKey(9), B)

    def one(key):
        M_true, data = mc.random_instance(key, m, n, k, frac=0.6, lam=1e-10)
        U0 = mc.spectral_init(data, k)
        res = tnt.solve(mc.make_problem(), U0, _params(iters=60), data=data)
        M_hat = mc.predict(res.x, data)
        return (jnp.linalg.norm(M_hat - M_true)
                / jnp.linalg.norm(M_true))

    errs = jax.vmap(one)(keys)
    assert np.asarray(errs).max() < 1e-5
