"""Gradient descent tests mirroring reference ``GradientDescent_unit_test.cpp``.

- Euclidean Rosenbrock (a=1, b=100) from x0=(0.1, 0.1): f ~ 0, |g| < 1e-4,
  |x - (1,1)| < 1e-4 with gradient tolerance 1e-6 and the relative-decrease /
  stepsize criteria disabled (ref ``GradientDescent_unit_test.cpp:50-75``).
- Riemannian GD on S^2 for f(X) = |X - P|^2 from a point on the equator
  (ref ``GradientDescent_unit_test.cpp:76-148``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_tpu import RiemannianProblem
from optimization_tpu.core.types import GradientDescentStatus
from optimization_tpu.manifolds import euclidean, sphere
from optimization_tpu.solvers import gradient_descent as gd


TOL = 1e-4

PARAMS = gd.GradientDescentParams(
    max_iterations=100000,
    gradient_tolerance=1e-6,
    relative_decrease_tolerance=0.0,
    stepsize_tolerance=0.0,
)


def rosenbrock(x, data):
    a, b = 1.0, 100.0
    return (a - x[0]) ** 2 + b * (x[1] - x[0] ** 2) ** 2


def test_rosenbrock():
    problem = RiemannianProblem(f=rosenbrock, manifold=euclidean())
    res = gd.solve(problem, jnp.array([0.1, 0.1]), PARAMS)
    assert int(res.status) == GradientDescentStatus.GRADIENT
    assert float(res.f) < TOL
    assert float(res.gradfx_norm) < TOL
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=TOL)
    # Traces: valid up to num_iterations; objective decreased monotonically
    n = int(res.num_iterations)
    obj = np.asarray(res.objective_values[: n + 1])
    assert np.isfinite(obj).all()
    assert (np.diff(obj) <= 0).all()


def test_sphere():
    P = jnp.array([0.0, 0.0, 1.0])

    def f(x, data):
        d = x - data
        return jnp.sum(d * d)

    problem = RiemannianProblem(f=f, manifold=sphere())
    x0 = jnp.array([-0.5, -0.5, -0.707107])
    res = gd.solve(problem, x0, PARAMS, data=P)
    assert int(res.status) == GradientDescentStatus.GRADIENT
    assert float(res.f) < TOL
    assert float(res.gradfx_norm) < TOL
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(P), atol=TOL)
    # Iterate stays on the sphere
    np.testing.assert_allclose(float(jnp.linalg.norm(res.x)), 1.0, atol=1e-12)


def test_vmapped_batch():
    """A fleet of Rosenbrock instances solved in one vmapped program."""
    problem = RiemannianProblem(f=rosenbrock, manifold=euclidean())
    params = gd.GradientDescentParams(
        max_iterations=100000, gradient_tolerance=1e-6,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0)
    x0s = jnp.stack([jnp.array([0.1, 0.1]), jnp.array([2.0, 2.0]),
                     jnp.array([0.5, -0.5])])
    res = jax.vmap(lambda x0: gd.solve(problem, x0, params))(x0s)
    assert res.x.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(res.x), np.ones((3, 2)), atol=TOL)


def test_log_iterates():
    problem = RiemannianProblem(f=rosenbrock, manifold=euclidean())
    params = gd.GradientDescentParams(
        max_iterations=50, gradient_tolerance=1e-6, log_iterates=True)
    x0 = jnp.array([0.1, 0.1])
    res = gd.solve(problem, x0, params)
    assert res.iterates is not None
    np.testing.assert_allclose(np.asarray(res.iterates[0]), np.asarray(x0))


def test_param_validation():
    with pytest.raises(ValueError):
        gd.GradientDescentParams(beta=1.5).validate()
    with pytest.raises(ValueError):
        gd.GradientDescentParams(gradient_tolerance=-1.0).validate()


def test_user_function_stops():
    """The jittable terminating user function (the seam the other five
    engines already have; the reference's GD callback is a void observer,
    GradientDescent.h:22-40) stops the solve BEFORE applying the update."""
    from optimization_tpu.core.types import GradientDescentStatus

    problem = RiemannianProblem(f=rosenbrock, manifold=euclidean())
    params = gd.GradientDescentParams(
        max_iterations=500, gradient_tolerance=1e-10,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0)
    x0 = jnp.array([0.1, 0.1])

    def stop_after_5(k, t, x, f, grad, h, df):
        return k >= 5

    res = gd.solve(problem, x0, params, user_function=stop_after_5)
    assert int(res.status) == GradientDescentStatus.USER_FUNCTION
    assert int(res.num_iterations) == 5
    # the iterate equals the plain solve's 5-iteration point (stop fires
    # before the 6th update is applied)
    ref = gd.solve(problem, x0, gd.GradientDescentParams(
        max_iterations=5, gradient_tolerance=1e-10,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
