"""TNT tests mirroring reference ``TNT_unit_test.cpp`` + the Euclidean example.

- Riemannian TNT on S^2 for f(X) = |X - P|^2: terminates with
  status=Gradient at |grad| < 1e-8, objective strictly decreased
  (ref ``TNT_unit_test.cpp:126-155``); repeated with a diagonal
  preconditioner (ref ``TNT_unit_test.cpp:157-187``).
- Euclidean TNT on Rosenbrock (ref ``Euclidean_optimization_example.cpp``).
- Rayleigh-quotient minimization on S^{n-1} (BASELINE config 2): TNT finds
  the smallest eigenpair of a diagonal operator.
"""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_tpu import RiemannianProblem
from optimization_tpu.core.types import TNTStatus
from optimization_tpu.manifolds import euclidean, sphere
from optimization_tpu.solvers import tnt
import pytest


EPS = 1e-8

P = jnp.array([0.0, 0.0, 1.0])
X0 = jnp.array([-0.5, -0.5, -0.707107])

PARAMS = tnt.TNTParams(
    gradient_tolerance=EPS,
    relative_decrease_tolerance=0.0,
    stepsize_tolerance=0.0,
    preconditioned_gradient_tolerance=0.0,
)


def f_sphere(x, data):
    d = x - data
    return jnp.sum(d * d)


def test_tnt_sphere():
    problem = RiemannianProblem(f=f_sphere, manifold=sphere())
    res = tnt.solve(problem, X0, PARAMS, data=P)
    assert int(res.status) == TNTStatus.GRADIENT
    assert float(res.gradfx_norm) < EPS
    assert float(res.f) < float(f_sphere(X0, P))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(P), atol=1e-6)


def test_tnt_sphere_preconditioned():
    D = jnp.array([1.0, 2.0, 3.0])
    problem = RiemannianProblem(
        f=f_sphere, manifold=sphere(),
        precon=lambda x, v, data: D * v)
    res = tnt.solve(problem, X0, PARAMS, data=P)
    assert int(res.status) == TNTStatus.GRADIENT
    assert float(res.gradfx_norm) < EPS
    assert float(res.f) < float(f_sphere(X0, P))


def test_tnt_rosenbrock():
    def rosenbrock(x, data):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    problem = RiemannianProblem(f=rosenbrock, manifold=euclidean())
    params = tnt.TNTParams(
        gradient_tolerance=1e-6, relative_decrease_tolerance=0.0,
        stepsize_tolerance=0.0, preconditioned_gradient_tolerance=0.0,
        max_iterations=1000)
    res = tnt.solve(problem, jnp.array([-1.2, 1.0]), params)
    assert int(res.status) == TNTStatus.GRADIENT
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-6)
    # Newton-type method: far fewer outer iterations than first-order GD
    assert int(res.num_iterations) < 100


def test_tnt_rayleigh_quotient():
    """Smallest eigenpair of diag(1..n) via TNT on S^{n-1}."""
    n = 50
    d = jnp.arange(1.0, n + 1.0)

    def f(x, data):
        return jnp.dot(x, data * x)

    problem = RiemannianProblem(f=f, manifold=sphere())
    key = jax.random.PRNGKey(42)
    x0 = sphere().rand(key, n)
    params = tnt.TNTParams(
        gradient_tolerance=1e-8, relative_decrease_tolerance=0.0,
        stepsize_tolerance=0.0, preconditioned_gradient_tolerance=0.0,
        max_iterations=500)
    res = tnt.solve(problem, x0, params, data=d)
    assert int(res.status) == TNTStatus.GRADIENT
    # Rayleigh quotient at the minimizer = smallest eigenvalue = 1
    np.testing.assert_allclose(float(res.f), 1.0, atol=1e-8)
    np.testing.assert_allclose(abs(float(res.x[0])), 1.0, atol=1e-4)


def test_tnt_batched():
    """vmapped fleet of sphere problems with different targets."""
    key = jax.random.PRNGKey(0)
    Ps = sphere().rand(key, 8, 3)
    problem = RiemannianProblem(f=f_sphere, manifold=sphere())
    x0 = jnp.tile(X0, (8, 1))
    res = jax.vmap(lambda x, p: tnt.solve(problem, x, PARAMS, data=p))(x0, Ps)
    assert res.x.shape == (8, 3)
    # All instances converge to their targets
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(Ps), atol=1e-5)


def test_tnt_user_function():
    problem = RiemannianProblem(f=f_sphere, manifold=sphere())
    stop_at_2 = lambda k, x, f, g, Delta, ii, h, df, rho, acc: k >= 2
    res = tnt.solve(problem, X0, PARAMS, data=P, user_function=stop_at_2)
    assert int(res.status) == TNTStatus.USER_FUNCTION


def test_tnt_traces():
    problem = RiemannianProblem(f=f_sphere, manifold=sphere())
    res = tnt.solve(problem, X0, PARAMS, data=P)
    n = int(res.num_iterations)
    obj = np.asarray(res.objective_values[: n + 1])
    assert np.isfinite(obj).all()
    # Objective trace non-increasing (accepted steps only decrease f)
    assert (np.diff(obj) <= 1e-15).all()
    # Trust-region trace recorded
    assert np.isfinite(np.asarray(res.trust_region_radius[: n + 1])).all()


def test_tnt_sphere_zero_hessian_start():
    """Regression: at x0 = e1 with target P = e3 the Riemannian Hessian of
    |x - P|^2 on S^2 vanishes identically, so the first STPCG search
    direction lies in ker(H).  The kernel escape must walk *downhill*
    (the reference's inverted sign walks to f = 2 + sqrt(2); see stpcg.py).
    """
    P = jnp.array([0.0, 0.0, 1.0])
    problem = RiemannianProblem(f=lambda x, d: jnp.sum((x - d) ** 2),
                                manifold=sphere())
    params = tnt.TNTParams(max_iterations=100, gradient_tolerance=1e-8,
                           relative_decrease_tolerance=0.0,
                           stepsize_tolerance=0.0,
                           preconditioned_gradient_tolerance=0.0)
    res = tnt.solve(problem, jnp.array([1.0, 0.0, 0.0]), params, data=P)
    assert int(res.status) == TNTStatus.GRADIENT
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(P), atol=1e-6)


def test_tnt_stiefel_eigenspace():
    """Brockett/Rayleigh on St(n, p): min tr(X' A X) recovers the invariant
    subspace of the p smallest eigenvalues (checked via the projector).

    NB: tr(X'AX) is invariant under the right O(p) action, so the Hessian is
    singular along the p(p-1)/2 orbit directions and near-boundary CG walks
    probe them.  Regression context: with the tangency-assuming polar
    retraction (Gram = I + V'V) those walks amplified roundoff drift off the
    manifold and the solve either stalled or escaped below the true minimum;
    the exact-Gram polar retraction makes the loop self-correcting and TNT
    converges quadratically despite the gauge.
    """
    from optimization_tpu.manifolds import stiefel

    n, p = 40, 3
    key = jax.random.PRNGKey(11)
    d = jnp.linspace(1.0, 40.0, n)

    def f(X, data):
        return jnp.trace(X.T @ (data[:, None] * X))

    problem = RiemannianProblem(f=f, manifold=stiefel())
    params = tnt.TNTParams(max_iterations=300, gradient_tolerance=1e-9,
                           relative_decrease_tolerance=0.0,
                           stepsize_tolerance=0.0,
                           preconditioned_gradient_tolerance=0.0)
    X0 = stiefel().rand(key, n, p)
    res = tnt.solve(problem, X0, params, data=d)
    assert int(res.status) == TNTStatus.GRADIENT
    # Objective = sum of the p smallest eigenvalues
    np.testing.assert_allclose(float(res.f), float(jnp.sum(d[:p])),
                               atol=1e-9)
    # Orthonormality is preserved by the exact-Gram polar retraction
    np.testing.assert_allclose(np.asarray(res.x.T @ res.x), np.eye(p),
                               atol=1e-10)
    # Projector onto the recovered subspace == projector onto e_1..e_p
    P_hat = np.asarray(res.x @ res.x.T)
    P_true = np.zeros((n, n)); P_true[:p, :p] = np.eye(p)
    np.testing.assert_allclose(P_hat, P_true, atol=1e-6)


def test_tnt_grassmann_eigenspace_quadratic_convergence():
    """The same Brockett objective on Gr(n, p): the O(p) gauge is quotiented
    out, the Hessian is nondegenerate at the minimizer, and TNT reaches a
    tight gradient tolerance (contrast with the Stiefel test above)."""
    from optimization_tpu.manifolds import grassmann

    n, p = 40, 3
    d = jnp.linspace(1.0, 40.0, n)

    def f(X, data):
        return jnp.trace(X.T @ (data[:, None] * X))

    problem = RiemannianProblem(f=f, manifold=grassmann())
    params = tnt.TNTParams(max_iterations=300, gradient_tolerance=1e-9,
                           relative_decrease_tolerance=0.0,
                           stepsize_tolerance=0.0,
                           preconditioned_gradient_tolerance=0.0)
    X0 = grassmann().rand(jax.random.PRNGKey(11), n, p)
    res = tnt.solve(problem, X0, params, data=d)
    assert int(res.status) == TNTStatus.GRADIENT
    np.testing.assert_allclose(float(res.f), float(jnp.sum(d[:p])),
                               atol=1e-10)
    P_hat = np.asarray(res.x @ res.x.T)
    P_true = np.zeros((n, n)); P_true[:p, :p] = np.eye(p)
    np.testing.assert_allclose(P_hat, P_true, atol=1e-7)


def test_bf16_storage_f32_accumulate():
    """Round-2 bf16 tier: TNT/STPCG with bf16 iterate storage and f32
    reductions (sphere manifold promotes sub-f32 storage for accumulation;
    stpcg's axpy updates cast back to storage dtype).  The trust-region
    logic must run entirely in f32 scalars and converge to the bf16-
    resolvable gradient floor."""
    import jax

    n = 4096
    dtype = jnp.bfloat16
    i = jnp.arange(n, dtype=jnp.float32)
    d = 1.0 + (999.0 / (n - 1)) * i

    def A_op(v):
        return (d * v.astype(jnp.float32))

    M = sphere()

    def f(x, dd):
        xf = x.astype(jnp.float32)
        return jnp.dot(xf, A_op(x))

    def grad(x, dd):
        return M.proj(x, (2.0 * A_op(x)).astype(dtype))

    def quadratic_model(x, dd):
        g = grad(x, None)
        rq = jnp.dot(x.astype(jnp.float32), 2.0 * A_op(x))

        def hvp(v):
            t = (2.0 * A_op(v)).astype(dtype)
            return (M.proj(x, t).astype(jnp.float32)
                    - rq * v.astype(jnp.float32)).astype(dtype)

        return g, hvp

    problem = RiemannianProblem(f=f, manifold=M, grad=grad,
                                quadratic_model=quadratic_model)
    x0 = M.rand(jax.random.PRNGKey(0), n).astype(dtype)
    params = tnt.TNTParams(
        max_iterations=60, max_TPCG_iterations=50,
        gradient_tolerance=0.5,       # bf16 floor: eps_bf16 ~ 8e-3 * |2A| ~ 16
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0)
    res = tnt.solve(problem, x0, params, data=None)

    # storage stayed bf16; scalars ran f32
    assert res.x.dtype == dtype
    assert res.f.dtype == jnp.float32
    assert np.isfinite(float(res.f))
    # Rayleigh quotient driven near the smallest eigenvalue (f* = 1); the
    # bf16 floor leaves O(1e-2) relative slack
    assert float(res.f) < 1.5, float(res.f)
    # and the iterate is still (numerically) on the sphere
    nrm = float(jnp.linalg.norm(res.x.astype(jnp.float32)))
    assert abs(nrm - 1.0) < 0.01


@pytest.mark.nan_traces  # feeds NaN rho fixtures to step_decision
def test_step_decision_rejects_nonpositive_model_decrease():
    """A non-positive model decrease must be treated like a NaN gain ratio
    (reject + shrink), even when rho itself is large and positive.

    This is the f32 failure observed on the 10^4-pose marginalized SE-Sync
    run: after 1000 capped inner CG iterations the recurrence-tracked dm
    went NEGATIVE while the step genuinely increased f (df < 0), so
    rho = df/dm = +7e4 passed the reference's "rho > eta1" test
    (``TNT.h:511-532``) and an objective-increasing step was accepted.
    """
    eta1, eta2 = 0.05, 0.9

    # The observed failure: df < 0, dm < 0 => rho large positive.
    rho = jnp.asarray((-0.07) / (-1e-6))        # +7e4
    acc, very, unsucc = tnt.step_decision(rho, jnp.asarray(-1e-6),
                                          eta1, eta2)
    assert not bool(acc) and not bool(very) and bool(unsucc)

    # dm == 0 (zero-iteration subproblem) is also a rejection.
    acc, very, unsucc = tnt.step_decision(jnp.asarray(jnp.nan),
                                          jnp.asarray(0.0), eta1, eta2)
    assert not bool(acc) and bool(unsucc)

    # Healthy cases keep reference semantics.
    acc, very, unsucc = tnt.step_decision(jnp.asarray(1.0),
                                          jnp.asarray(1e-6), eta1, eta2)
    assert bool(acc) and bool(very) and not bool(unsucc)
    acc, very, unsucc = tnt.step_decision(jnp.asarray(0.5),
                                          jnp.asarray(1e-6), eta1, eta2)
    assert bool(acc) and not bool(very) and not bool(unsucc)
    acc, very, unsucc = tnt.step_decision(jnp.asarray(0.01),
                                          jnp.asarray(1e-6), eta1, eta2)
    assert not bool(acc) and bool(unsucc)
    acc, very, unsucc = tnt.step_decision(jnp.asarray(jnp.nan),
                                          jnp.asarray(1e-6), eta1, eta2)
    assert not bool(acc) and bool(unsucc)


def test_bf16_f32_escalation():
    """solve_escalated: the bf16 stage stalls at its rounding floor (the
    reference RelativeDecrease criterion doubling as the stall detector),
    the carry promotes to f32, and the final state terminates under the
    caller's own gradient tolerance (reference contract TNT.h:122-125)."""
    from optimization_tpu.linalg.flat_cg import sphere_rayleigh_flat
    from optimization_tpu.manifolds import sphere

    n = 4096
    d = jnp.linspace(1.0, 1000.0, n).astype(jnp.float32)
    A_elem = lambda v: d * v.astype(jnp.float32)
    M = sphere()
    f = lambda x, dd: jnp.dot(x.astype(jnp.float32), A_elem(x))
    grad = lambda x, dd: M.proj(x, (2.0 * A_elem(x)).astype(x.dtype))

    def flat_qm(x, dd):
        A0, U, B, _ = sphere_rayleigh_flat(x, A_elem)
        return A0, U, B

    problem = RiemannianProblem(f=f, manifold=M, grad=grad, flat_qm=flat_qm)
    params = tnt.TNTParams(
        max_iterations=100, max_TPCG_iterations=100,
        gradient_tolerance=2e-4, relative_decrease_tolerance=0.0,
        stepsize_tolerance=0.0, preconditioned_gradient_tolerance=0.0)
    x0 = M.rand(jax.random.PRNGKey(11), n).astype(jnp.float32)

    res = tnt.solve_escalated(problem, x0, params)

    assert int(res.switch_iteration) > 0          # bf16 stage did work
    assert res.stage_low.x.dtype == jnp.bfloat16
    assert res.x.dtype == jnp.float32
    # the bf16 stage stopped at its floor (TR collapse is the floor
    # detector) or already at the final tolerance
    assert int(res.stage_low.status) in (
        TNTStatus.TRUST_REGION, TNTStatus.GRADIENT)
    # final termination honors the caller's gradient tolerance
    assert int(res.status) == TNTStatus.GRADIENT
    assert float(res.gradfx_norm) < 2e-4
    np.testing.assert_allclose(float(res.f), 1.0, atol=1e-4)
    # the f32 tail is short relative to the whole descent
    assert int(res.stage_high.num_iterations) <= int(res.num_iterations)
