"""Direct manifold-geometry tests: projections, retractions, products.

The reference is geometry-agnostic (geometry enters via injected callbacks,
``Riemannian/Concepts.h:44-112``); these pin the geometry bundles this
framework ships.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_tpu import RiemannianProblem
from optimization_tpu.core.types import TNTStatus
from optimization_tpu.manifolds import (euclidean, grassmann, product,
                                        rotations, sphere, stiefel)
from optimization_tpu.solvers import tnt

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("M,shape", [
    (sphere(), (16,)),
    (stiefel(), (10, 3)),
    (rotations(), (4, 3, 3)),
    (grassmann(), (10, 3)),
])
def test_projection_idempotent_and_tangent(M, shape):
    k1, k2 = jax.random.split(KEY)
    x = M.rand(k1, *shape)
    a = jax.random.normal(k2, x.shape)
    v = M.proj(x, a)
    np.testing.assert_allclose(np.asarray(M.proj(x, v)), np.asarray(v),
                               atol=1e-12)


@pytest.mark.parametrize("M,shape", [
    (sphere(), (16,)),
    (stiefel(), (10, 3)),
    (rotations(), (4, 3, 3)),
    (grassmann(), (10, 3)),
])
def test_retraction_stays_on_manifold_even_for_ambient_v(M, shape):
    """Robustness contract: the retraction returns a manifold point for ANY
    ambient perturbation, not just tangent ones (trust-region loops rely on
    this self-correction; see manifolds/stiefel.py)."""
    k1, k2 = jax.random.split(KEY)
    x = M.rand(k1, *shape)
    a = 0.3 * jax.random.normal(k2, x.shape)   # NOT projected
    y = M.retract(x, a)
    if M.name == "sphere":
        np.testing.assert_allclose(float(jnp.linalg.norm(y)), 1.0,
                                   atol=1e-12)
    else:
        p = y.shape[-1]
        eye = jnp.swapaxes(y, -1, -2) @ y
        np.testing.assert_allclose(
            np.asarray(eye),
            np.broadcast_to(np.eye(p), eye.shape), atol=1e-10)
        if M.name == "so":
            assert (np.asarray(jnp.linalg.det(y)) > 0).all()


def test_retraction_first_order():
    """R_x(tv) = x + tv + O(t^2) for tangent v (first-order retraction)."""
    for M, shape in ((sphere(), (16,)), (stiefel(), (10, 3)),
                     (grassmann(), (10, 3))):
        k1, k2 = jax.random.split(KEY)
        x = M.rand(k1, *shape)
        v = M.proj(x, jax.random.normal(k2, x.shape))
        for t in (1e-3, 1e-4):
            err = float(jnp.linalg.norm(
                (M.retract(x, t * v) - (x + t * v)).reshape(-1)))
            assert err < 10 * t ** 2 * float(jnp.linalg.norm(v.reshape(-1))) ** 2


def test_product_manifold_tnt():
    """TNT over sphere x euclidean: min |x - P|^2 + |b - c|^2 with x on S^2.

    The variable is a tuple; the product geometry zips the factors."""
    M = product((sphere(), euclidean()))
    P = jnp.array([0.0, 0.0, 1.0])
    c = jnp.array([2.0, -1.0])

    def f(xb, data):
        x, b = xb
        return jnp.sum((x - P) ** 2) + jnp.sum((b - c) ** 2)

    problem = RiemannianProblem(f=f, manifold=M)
    params = tnt.TNTParams(max_iterations=100, gradient_tolerance=1e-9,
                           relative_decrease_tolerance=0.0,
                           stepsize_tolerance=0.0,
                           preconditioned_gradient_tolerance=0.0)
    x0 = (jnp.array([1.0, 0.0, 0.0]), jnp.zeros(2))
    res = tnt.solve(problem, x0, params)
    assert int(res.status) == TNTStatus.GRADIENT
    np.testing.assert_allclose(np.asarray(res.x[0]), np.asarray(P),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x[1]), np.asarray(c),
                               atol=1e-8)
