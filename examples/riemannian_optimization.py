"""BASELINE config 2: Riemannian GD + TNT on the sphere.

Mirrors ``examples/Riemannian_optimization_example.cpp`` (minimize |X - P|^2
over S^2) and the benchmark's Rayleigh-quotient minimization on S^{n-1}
(smallest eigenpair of an SPD operator).  Run:
python examples/riemannian_optimization.py
"""

import time

import jax
import jax.numpy as jnp

from _common import report, setup

setup()

from optimization_tpu import RiemannianProblem
from optimization_tpu.manifolds import sphere
from optimization_tpu.solvers import gradient_descent as gd, tnt


def main():
    f64 = jnp.zeros(()).dtype == jnp.float64
    tol = 1e-8 if f64 else 1e-4

    # --- |X - P|^2 over S^2 (the reference example) ---
    P = jnp.array([0.0, 0.0, 1.0])
    f = lambda x, p: jnp.sum((x - p) ** 2)
    problem = RiemannianProblem(f=f, manifold=sphere())
    x0 = jnp.array([-0.5, -0.5, -0.707107])

    t0 = time.time()
    res = gd.solve(problem, x0, gd.GradientDescentParams(
        max_iterations=100000, gradient_tolerance=tol,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0), data=P)
    report("GD  sphere", res, t0, f"x={res.x}")

    t0 = time.time()
    res = tnt.solve(problem, x0, tnt.TNTParams(
        gradient_tolerance=tol, relative_decrease_tolerance=0.0,
        stepsize_tolerance=0.0, preconditioned_gradient_tolerance=0.0),
        data=P)
    report("TNT sphere", res, t0, f"x={res.x}")

    # --- Rayleigh quotient on S^{n-1}: smallest eigenpair of diag(1..n) ---
    n = 4096
    d = jnp.linspace(1.0, 1000.0, n)
    rq = RiemannianProblem(f=lambda x, dd: jnp.dot(x, dd * x),
                           manifold=sphere())
    x0 = sphere().rand(jax.random.PRNGKey(0), n)
    t0 = time.time()
    res = tnt.solve(rq, x0, tnt.TNTParams(
        max_iterations=200, gradient_tolerance=(1e-8 if f64 else 1e-4),
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0), data=d)
    report("TNT rayleigh-4096", res, t0,
           f"lambda_min~{float(res.f):.6f} (true 1.0)")


if __name__ == "__main__":
    main()
