"""Config 2: TNT Rayleigh-quotient minimization on S^{n-1}, n = 2^20.

The headline benchmark (same configuration as bench.py): the Hv product is a
fused diag+stencil SPD matvec — pure HBM-bandwidth work — so the metric is
the fraction of the chip's HBM roofline the hot operator sustains
(north-star target >= 0.80) plus the full-solve outer iteration rate.
"""

import jax
import jax.numpy as jnp

from _util import chip_bandwidth, emit, timeit

from optimization_tpu import RiemannianProblem
from optimization_tpu.kernels import diag_stencil_matvec
from optimization_tpu.manifolds import sphere
from optimization_tpu.solvers import tnt


def main():
    n = 1 << 20
    dtype = jnp.float32
    d = jnp.linspace(1.0, 1000.0, n, dtype=dtype)
    A_op = lambda v: diag_stencil_matvec(d, v)

    def quadratic_model(x, dd):
        Ax2 = 2.0 * A_op(x)
        g = sphere().proj(x, Ax2)
        rq = jnp.dot(x, Ax2)
        return g, lambda v: sphere().proj(x, 2.0 * A_op(v)) - rq * v

    problem = RiemannianProblem(
        f=lambda x, dd: jnp.dot(x, A_op(x)), manifold=sphere(),
        grad=lambda x, dd: sphere().proj(x, 2.0 * A_op(x)),
        quadratic_model=quadratic_model)

    # Raw Hv throughput
    x = sphere().rand(jax.random.PRNGKey(0), n).astype(dtype)
    v = sphere().proj(x, jax.random.normal(jax.random.PRNGKey(1), (n,), dtype))

    @jax.jit
    def chain(u, k):
        return jax.lax.fori_loop(0, k, lambda _, u: A_op(u) * 1e-3, u)

    k = 400
    dt = timeit(lambda: chain(v, k), iters=1, warmup=1)
    gbps = 3 * 4 * n * k / dt / 1e9
    roofline, kind = chip_bandwidth()

    # Full solve iteration rate
    params = tnt.TNTParams(
        max_iterations=30, max_TPCG_iterations=50, gradient_tolerance=1e-5,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0)
    x0 = sphere().rand(jax.random.PRNGKey(2), n).astype(dtype)
    res = tnt.solve(problem, x0, params)
    jax.block_until_ready(res.x)
    dts = timeit(lambda: tnt.solve(problem, x0, params).x, iters=1)
    outer = int(res.num_iterations)

    frac = gbps / roofline
    emit("tnt_rayleigh_hv_roofline_frac", frac,
         f"fraction of {roofline:.0f} GB/s ({kind}); hv={gbps:.1f} GB/s; "
         f"{outer} outer it in {dts:.2f}s ({outer/dts:.2f} it/s), "
         f"f*={float(res.f):.4f}",
         frac / 0.80)


if __name__ == "__main__":
    main()
