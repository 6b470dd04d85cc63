"""TNLS tests mirroring reference ``TNLS_unit_test.cpp``.

Sinusoid fitting f(x; omega, phi) = sin(omega x + phi), m=100 points on
[-pi, pi], truth (omega, phi) = (pi/2, pi/4), start (1, 1):

- Root finding on noiseless data: status=Root, |F| < 1e-6 (ref lines 150-174).
- Noisy least-squares fit: status=Gradient, |gradL| < 1e-6, final residual
  strictly below the injected noise norm (ref lines 177-224).
- Same with the QR-based right preconditioner (ref lines 227-281).
"""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_tpu import LeastSquaresProblem
from optimization_tpu.core.types import TNLSStatus
from optimization_tpu.solvers import tnls
import pytest


EPS = 1e-6
M_PTS = 100
OMEGA, PHI = np.pi / 2, np.pi / 4
XS = jnp.linspace(-np.pi, np.pi, M_PTS)
Y_CLEAN = jnp.sin(OMEGA * XS + PHI)
BETA0 = jnp.array([1.0, 1.0])


def residual(beta, y):
    return y - jnp.sin(beta[0] * XS + beta[1])


def test_root_finding():
    problem = LeastSquaresProblem(residual=residual)
    params = tnls.TNLSParams(
        relative_decrease_tolerance=0.0, gradient_tolerance=0.0,
        stepsize_tolerance=0.0, Delta_tolerance=0.0, root_tolerance=EPS)
    res = tnls.solve(problem, BETA0, params, data=Y_CLEAN)
    assert int(res.status) == TNLSStatus.ROOT
    assert float(jnp.linalg.norm(residual(res.x, Y_CLEAN))) < EPS
    np.testing.assert_allclose(np.asarray(res.x), [OMEGA, PHI], atol=1e-5)


def _noisy_setup():
    rng = np.random.default_rng(3)
    z = 0.1 * rng.uniform(-1, 1, M_PTS)
    return Y_CLEAN + jnp.asarray(z), float(np.linalg.norm(z))


NOISY_PARAMS = tnls.TNLSParams(
    relative_decrease_tolerance=0.0, gradient_tolerance=EPS,
    stepsize_tolerance=0.0, Delta_tolerance=1e-10)


def test_noisy_least_squares():
    y, z_norm = _noisy_setup()
    problem = LeastSquaresProblem(residual=residual)
    res = tnls.solve(problem, BETA0, NOISY_PARAMS, data=y)
    assert int(res.status) == TNLSStatus.GRADIENT
    assert float(res.gradfx_norm) < EPS
    # Residual at the fit beats the residual at the planted signal
    assert float(jnp.linalg.norm(residual(res.x, y))) < z_norm


def test_noisy_least_squares_preconditioned():
    y, z_norm = _noisy_setup()

    def jac(beta):
        return jax.jacfwd(lambda b: residual(b, y))(beta)

    def Mp(x, v, data):
        # Right preconditioner: R^{-1} v with R from a QR of the Jacobian
        r = jnp.linalg.qr(jac(x), mode="r")
        return jax.scipy.linalg.solve_triangular(r, v, lower=False)

    def Mpt(x, v, data):
        r = jnp.linalg.qr(jac(x), mode="r")
        return jax.scipy.linalg.solve_triangular(r.T, v, lower=True)

    problem = LeastSquaresProblem(residual=residual, precon=(Mp, Mpt))
    res = tnls.solve(problem, BETA0, NOISY_PARAMS, data=y)
    assert int(res.status) == TNLSStatus.GRADIENT
    assert float(res.gradfx_norm) < EPS
    assert float(jnp.linalg.norm(residual(res.x, y))) < z_norm


def test_batched_tnls():
    """vmapped fleet over different noise realizations."""
    rng = np.random.default_rng(7)
    ys = Y_CLEAN + jnp.asarray(0.05 * rng.uniform(-1, 1, (4, M_PTS)))
    problem = LeastSquaresProblem(residual=residual)
    res = jax.vmap(
        lambda y: tnls.solve(problem, BETA0, NOISY_PARAMS, data=y))(ys)
    assert res.x.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(res.x),
                               np.tile([OMEGA, PHI], (4, 1)), atol=0.05)


def test_user_function_early_stop():
    """TNLSUserFunction analog: a predicate that fires immediately stops the
    solve with USER_FUNCTION status before any update (ref TNLS.h:604-613)."""
    problem = LeastSquaresProblem(residual=residual)
    params = tnls.TNLSParams(max_iterations=50, root_tolerance=1e-10,
                             gradient_tolerance=1e-12,
                             relative_decrease_tolerance=0.0,
                             stepsize_tolerance=0.0)
    stop = lambda k, x, Fx, Delta, inner, h, dL, rho, acc: jnp.asarray(True)
    res = tnls.solve(problem, BETA0, params, data=Y_CLEAN,
                     user_function=stop)
    assert int(res.status) == TNLSStatus.USER_FUNCTION
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(BETA0))
