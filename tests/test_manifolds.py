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


class TestBf16Tier:
    """Round-3 dtype audit (ROADMAP numerics debt): the matrix manifolds'
    geometry under bf16 storage / f32 accumulation.  Contract (same as
    ``sphere._acc``): every product/reduction promotes to f32; results
    return in the storage dtype; the stored iterate's manifold error is ONE
    bf16 rounding, never accumulated drift (the exact-Gram polar retraction
    re-corrects it each step)."""

    MS = [(stiefel(), (12, 3)), (rotations(), (4, 3, 3)),
          (grassmann(), (12, 3))]

    @pytest.mark.parametrize("M,shape", MS)
    def test_retraction_bf16_one_rounding_from_manifold(self, M, shape):
        k1, k2 = jax.random.split(KEY)
        x = M.rand(k1, *shape).astype(jnp.bfloat16)
        v = (0.3 * jax.random.normal(k2, x.shape)).astype(jnp.bfloat16)
        y = M.retract(x, v)
        assert y.dtype == jnp.bfloat16
        yf = y.astype(jnp.float64)
        p = shape[-1]
        gram = np.asarray(jnp.swapaxes(yf, -1, -2) @ yf)
        # one bf16 rounding of an orthonormal factor: |X'X - I| entries are
        # O(n * eps_bf16 * |X|) ~ a few 1e-2 at these sizes
        np.testing.assert_allclose(
            gram, np.broadcast_to(np.eye(p), gram.shape), atol=0.08)

    @pytest.mark.parametrize("M,shape", MS)
    def test_proj_bf16_storage_dtype_and_idempotent(self, M, shape):
        k1, k2 = jax.random.split(KEY)
        x = M.rand(k1, *shape).astype(jnp.bfloat16)
        a = jax.random.normal(k2, x.shape).astype(jnp.bfloat16)
        v = M.proj(x, a)
        assert v.dtype == jnp.bfloat16
        v2 = M.proj(x, v)
        np.testing.assert_allclose(np.asarray(v2, np.float64),
                                   np.asarray(v, np.float64), atol=0.05)

    def test_tnt_grassmann_bf16_storage(self):
        """End-to-end: the Brockett eigenspace solve with bf16 iterate
        storage converges to the bf16-resolvable floor with an (almost)
        orthonormal stored basis — the matrix-manifold analog of the
        sphere tier test (tests/test_tnt.py::test_bf16_storage...)."""
        n, p = 40, 3
        d = jnp.linspace(1.0, 40.0, n).astype(jnp.float32)

        def f(X, data):
            Xf = X.astype(jnp.float32)
            return jnp.sum(Xf * (data[:, None] * Xf))

        problem = RiemannianProblem(f=f, manifold=grassmann())
        params = tnt.TNTParams(
            max_iterations=100,
            gradient_tolerance=0.15,   # bf16 floor: eps_bf16 * |2A| ~ 0.6
            relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
            preconditioned_gradient_tolerance=0.0)
        X0 = grassmann().rand(jax.random.PRNGKey(3), n, p)
        X0 = X0.astype(jnp.bfloat16)
        res = tnt.solve(problem, X0, params, data=d)
        assert res.x.dtype == jnp.bfloat16
        # f* = 1+2+3 = 6 at the bf16 floor (storage quantization of X
        # perturbs tr(X'AX) by O(eps_bf16 * |A|) ~ 0.3)
        assert abs(float(res.f) - float(jnp.sum(d[:p]))) < 0.5
        Xf = np.asarray(res.x, np.float64)
        np.testing.assert_allclose(Xf.T @ Xf, np.eye(p), atol=0.08)
