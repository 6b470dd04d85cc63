"""BASELINE config 1: Euclidean GD + TNT on the (chained) Rosenbrock function.

Mirrors ``examples/Euclidean_optimization_example.cpp`` (2-dim Rosenbrock via
GD and TNT) and extends it to the 100-dim chained Rosenbrock of the benchmark
config.  Run: python examples/euclidean_optimization.py
"""

import time

import jax.numpy as jnp

from _common import report, setup

setup()

from optimization_tpu import RiemannianProblem
from optimization_tpu.manifolds import euclidean
from optimization_tpu.solvers import gradient_descent as gd, tnt


def rosenbrock2(x, data):
    return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def chained_rosenbrock(x, data):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def main():
    tol = 1e-6 if jnp.zeros(()).dtype == jnp.float64 else 1e-3

    problem2 = RiemannianProblem(f=rosenbrock2, manifold=euclidean())
    x0 = jnp.array([-1.2, 1.0])

    t0 = time.time()
    res = gd.solve(problem2, x0, gd.GradientDescentParams(
        max_iterations=200000, gradient_tolerance=tol,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0))
    report("GD  rosenbrock-2d", res, t0, f"x={res.x}")

    t0 = time.time()
    res = tnt.solve(problem2, x0, tnt.TNTParams(
        max_iterations=1000, gradient_tolerance=tol,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0))
    report("TNT rosenbrock-2d", res, t0, f"x={res.x}")

    problem100 = RiemannianProblem(f=chained_rosenbrock, manifold=euclidean())
    x100 = jnp.full((100,), -1.0)
    t0 = time.time()
    res = tnt.solve(problem100, x100, tnt.TNTParams(
        max_iterations=2000, gradient_tolerance=tol,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0))
    report("TNT rosenbrock-100d", res, t0,
           f"|x-1|={float(jnp.linalg.norm(res.x - 1.0)):.2e}")


if __name__ == "__main__":
    main()
