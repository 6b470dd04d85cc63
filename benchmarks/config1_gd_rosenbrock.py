"""Config 1: gradient descent + Armijo line search — 100-dim ill-conditioned
quadratic (throughput) + 2-dim Rosenbrock (reference-parity check).

Metric: GD outer iterations/second on the n=100 quadratic (cond = 10^3); the
whole solve is one XLA program, so this measures the fused iteration latency
including the backtracking loop.  vs_baseline reports parity with the
reference's Rosenbrock test (``GradientDescent_unit_test.cpp:14-74``:
|x - (1,1)| < 1e-4 equivalent; relaxed to 1e-3 in f32) — 1.0 = pass.
"""

import jax
import jax.numpy as jnp

from _util import emit, timeit

from optimization_tpu import RiemannianProblem
from optimization_tpu.solvers import gradient_descent as gd


def main():
    n = 100
    d = jnp.logspace(0, 3, n, dtype=jnp.float32)       # cond = 1e3

    problem = RiemannianProblem(f=lambda x, dd: 0.5 * jnp.dot(x, dd * x))
    params = gd.GradientDescentParams(
        max_iterations=5000, gradient_tolerance=1e-6,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0)
    x0 = jnp.ones((n,), jnp.float32)

    res = gd.solve(problem, x0, params, data=d)
    jax.block_until_ready(res.x)
    dt = timeit(lambda: gd.solve(problem, x0, params, data=d).x, iters=3)
    iters = int(res.num_iterations)

    # Reference-parity: 2-dim Rosenbrock from (-0.5, 0.5)
    rosen = RiemannianProblem(
        f=lambda x, dd: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2)
    rparams = gd.GradientDescentParams(
        max_iterations=20000, gradient_tolerance=1e-6,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0)
    rres = gd.solve(rosen, jnp.array([-0.5, 0.5], jnp.float32), rparams)
    err = float(jnp.max(jnp.abs(rres.x - 1.0)))

    emit("gd_quadratic100_iters_per_s", iters / dt,
         f"outer it/s (n={n}, cond=1e3, {iters} iters; "
         f"Rosenbrock parity max|x-1|={err:.1e})",
         1.0 if err < 1e-3 else 0.0)


if __name__ == "__main__":
    main()
