"""Euclidean sugar entry points (reference ``EuclideanGradientDescent`` /
``EuclideanTNT`` / ``EuclideanTNLS``: ``GradientDescent.h:420-433``,
``TNT.h:757-805``, ``TNLS.h:747-765``)."""

import jax.numpy as jnp
import numpy as np

from optimization_tpu import (euclidean_gradient_descent, euclidean_tnls,
                              euclidean_tnt)
from optimization_tpu.core.types import (GradientDescentStatus, TNLSStatus,
                                         TNTStatus)
from optimization_tpu.solvers import gradient_descent, tnls, tnt
import pytest



def rosenbrock(x, data):
    return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def test_euclidean_gradient_descent_rosenbrock():
    params = gradient_descent.GradientDescentParams(
        max_iterations=20000, gradient_tolerance=1e-6,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0)
    r = euclidean_gradient_descent(rosenbrock, jnp.array([-0.5, 0.5]), params)
    assert int(r.status) == GradientDescentStatus.GRADIENT
    np.testing.assert_allclose(np.asarray(r.x), [1.0, 1.0], atol=1e-4)


def test_euclidean_tnt_rosenbrock():
    params = tnt.TNTParams(max_iterations=200, gradient_tolerance=1e-8,
                           relative_decrease_tolerance=0.0,
                           stepsize_tolerance=0.0,
                           preconditioned_gradient_tolerance=0.0)
    r = euclidean_tnt(rosenbrock, jnp.array([-0.5, 0.5]), params)
    assert int(r.status) == TNTStatus.GRADIENT
    np.testing.assert_allclose(np.asarray(r.x), [1.0, 1.0], atol=1e-6)


def test_euclidean_tnls_sinusoid_root():
    # Noiseless sinusoid fit: F(omega, phi) = sin(omega t + phi) - y
    # (reference TNLS_unit_test.cpp:151-174: status must be Root)
    t = jnp.linspace(0.0, 2.0, 100)
    true = jnp.array([2.0, 0.5])
    y = jnp.sin(true[0] * t + true[1])

    def F(x, data):
        return jnp.sin(x[0] * t + x[1]) - y

    params = tnls.TNLSParams(max_iterations=100, root_tolerance=1e-6,
                             gradient_tolerance=1e-10,
                             relative_decrease_tolerance=0.0,
                             stepsize_tolerance=0.0)
    r = euclidean_tnls(F, jnp.array([1.8, 0.3]), params)
    assert int(r.status) == TNLSStatus.ROOT
    assert float(r.f) < 1e-6
