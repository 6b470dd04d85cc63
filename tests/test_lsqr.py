"""LSQR tests mirroring reference ``IterativeSolvers_unit_test.cpp`` (LSQR half).

- Trivial inconsistent system with A'b = 0: terminates in 0 iterations with
  x = 0 (ref lines 519-557).
- Consistent overdetermined 4x3 system: |r| < btol |b|, < 4*ncols iterations
  (ref lines 560-597).
- Inconsistent system: converges toward the normal-equations solution
  (ref lines 599-634).
- Binding trust region Delta = |x_LS|/2: |x| = Delta (ref lines 637-688).
- Tikhonov lambda = 1: matches (A'A + lambda I)^{-1} A'b (ref lines 691-731).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optimization_tpu.linalg.lsqr import lsqr

EPS_ABS = 1e-6
EPS_REL = 1e-6

A = jnp.array([
    [10.0, 5.0, 10.0],
    [2.0, 9.0, 8.0],
    [10.0, 2.0, 10.0],
    [10.0, 5.0, 7.0],
])
inner = lambda u, v: jnp.dot(u, v)
A_op = lambda x: A @ x
At_op = lambda y: A.T @ y


def test_trivial_solution():
    """A'b = 0 => x = 0 is already stationary: return immediately."""
    A0 = jnp.zeros((3, 2)).at[1:, :].set(jnp.eye(2))
    b = jnp.array([1.0, 0.0, 0.0])
    res = lsqr(lambda x: A0 @ x, lambda y: A0.T @ y, b, inner, inner)
    assert int(res.num_iterations) == 0
    assert abs(float(jnp.linalg.norm(res.x)) - float(res.xnorm)) < EPS_ABS
    assert float(res.xnorm) < EPS_ABS


def test_consistent_overdetermined():
    xtrue = jnp.array([1.0, 2.0, 3.0])
    b = A @ xtrue
    res = lsqr(A_op, At_op, b, inner, inner, btol=EPS_REL)
    r = A @ res.x - b
    assert float(jnp.linalg.norm(r)) < float(jnp.linalg.norm(b)) * EPS_REL
    xn = float(jnp.linalg.norm(res.x))
    assert abs(float(res.xnorm) - xn) < EPS_REL * xn
    assert int(res.num_iterations) < 4 * A.shape[1]


def test_inconsistent():
    b = jnp.array([1.0, 9.0, 10.0, 2.0])
    xtrue = jnp.asarray(np.linalg.lstsq(np.asarray(A), np.asarray(b),
                                        rcond=None)[0])
    res = lsqr(A_op, At_op, b, inner, inner, btol=0.0, Atol=EPS_REL)
    xn = float(jnp.linalg.norm(res.x))
    assert float(jnp.linalg.norm(res.x - xtrue)) < xn
    assert abs(float(res.xnorm) - xn) < EPS_REL * xn
    assert int(res.num_iterations) < 4 * A.shape[1]


def test_trust_region_binding():
    b = jnp.array([1.0, 9.0, 10.0, 2.0])
    xLS = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    Delta = float(np.linalg.norm(xLS)) / 2
    res = lsqr(A_op, At_op, b, inner, inner, btol=0.0, Atol=0.0,
               cond_limit=1e12, Delta=Delta)
    assert int(res.num_iterations) < 4 * A.shape[1]
    xn = float(jnp.linalg.norm(res.x))
    assert abs(float(res.xnorm) - xn) < EPS_REL * xn
    # Terminates exactly on the trust-region boundary
    assert abs(float(res.xnorm) - Delta) < EPS_ABS
    # Still reduces the residual
    assert float(jnp.linalg.norm(A @ res.x - b)) < float(jnp.linalg.norm(b))


def test_tikhonov():
    b = jnp.array([1.0, 9.0, 10.0, 2.0])
    lam = 1.0
    M = np.asarray(A).T @ np.asarray(A) + lam * np.eye(3)
    xtrue = np.linalg.solve(M, np.asarray(A).T @ np.asarray(b))
    res = lsqr(A_op, At_op, b, inner, inner, lam=lam, btol=0.0, Atol=EPS_REL)
    xn = float(jnp.linalg.norm(res.x))
    assert float(jnp.linalg.norm(res.x - jnp.asarray(xtrue))) < xn
    assert abs(float(res.xnorm) - xn) < EPS_REL * xn
    assert int(res.num_iterations) < 4 * A.shape[1]


def test_param_validation():
    b = jnp.zeros(4)
    with pytest.raises(ValueError):
        lsqr(A_op, At_op, b, inner, inner, lam=-1.0)
    with pytest.raises(ValueError):
        lsqr(A_op, At_op, b, inner, inner, cond_limit=0.0)


def test_user_function_early_stop():
    """LSQRUserFunction analog (ref IterativeSolvers.h:843-851)."""
    A = jnp.array([[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])
    b = jnp.array([2.0, 3.0, 2.0])
    stop = lambda k, x, xn, rn, Arn, An, cn: k >= 0  # fire after 1st iter
    res = lsqr(lambda v: A @ v, lambda u: A.T @ u, b, inner, inner,
               max_iterations=100, user_function=stop)
    assert int(res.num_iterations) == 1


def _explicit_rsq(x):
    """|b - A x|^2 computed explicitly (what the recurrence must match)."""
    return lambda b: float(jnp.dot(b - A @ x, b - A @ x))


@pytest.mark.parametrize("lam,Delta", [
    (0.0, None),          # plain least squares
    (0.0, 0.35),          # trust-region clip (Delta < |x_LS|)
    (1.0, None),          # Tikhonov damping
    (1.0, 0.2),           # damping + clip
])
def test_rsq_recurrence_matches_explicit(lam, Delta):
    """LSQRResult.rsq (the scalar-recurrence |b - A x|^2 that lets TNLS skip
    the reference's explicit gradFx(x,h) product, TNLS.h:565-572) must match
    the explicitly computed residual in every regime, including through the
    trust-region boundary clip."""
    b = jnp.array([1.0, 9.0, 10.0, 2.0])
    res = lsqr(A_op, At_op, b, inner, inner, lam=lam, btol=0.0, Atol=1e-10,
               cond_limit=1e14, Delta=Delta, max_iterations=50)
    explicit = float(jnp.dot(b - A @ res.x, b - A @ res.x))
    assert float(res.rsq) == pytest.approx(explicit, rel=1e-8, abs=1e-10)
    if Delta is not None:
        # the clip actually fired (otherwise this case tests nothing)
        assert float(res.xnorm) == pytest.approx(Delta, abs=1e-9)


def test_rsq_recurrence_random_sweep():
    """Recurrence == explicit residual over random rectangular systems,
    damping values, and binding/non-binding trust regions, at every
    truncation point (max_iterations sweep) — the TNLS forcing term stops
    LSQR early, so mid-iteration values matter as much as converged ones."""
    rng = np.random.default_rng(0)
    for trial in range(20):
        m, n = int(rng.integers(3, 12)), int(rng.integers(2, 8))
        Arnd = jnp.asarray(rng.normal(size=(m, n)))
        b = jnp.asarray(rng.normal(size=(m,)))
        lam = float(rng.choice([0.0, 0.0, 0.3, 2.0]))
        xLS = np.linalg.lstsq(np.asarray(Arnd), np.asarray(b), rcond=None)[0]
        Delta = (None if trial % 2 else
                 float(0.3 + 0.7 * rng.random()) * max(
                     float(np.linalg.norm(xLS)), 1e-3))
        for kmax in (1, 2, 5, 30):
            res = lsqr(lambda v: Arnd @ v, lambda u: Arnd.T @ u, b,
                       inner, inner, lam=lam, btol=0.0, Atol=1e-12,
                       cond_limit=1e14, Delta=Delta, max_iterations=kmax)
            r = b - Arnd @ res.x
            explicit = float(jnp.dot(r, r))
            assert float(res.rsq) == pytest.approx(
                explicit, rel=1e-7, abs=1e-9), (
                trial, m, n, lam, Delta, kmax)
