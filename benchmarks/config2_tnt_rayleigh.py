"""Config 2: TNT Rayleigh-quotient minimization on S^{n-1}, n = 2^24.

The headline benchmark (same configuration as bench.py): the Hv product is
the fused Pallas diag+stencil kernel; the metric is hv bandwidth as a
fraction of the *measured* 3-stream ceiling (stream3_probe — the attainable
roofline for this traffic pattern), with the spec-sheet fraction reported
alongside.  North-star target >= 0.80.
"""

import time

import jax
import jax.numpy as jnp

from _util import chip_bandwidth, emit

from optimization_tpu import RiemannianProblem
from optimization_tpu.kernels import diag_stencil_matvec, stream3_probe
from optimization_tpu.manifolds import sphere
from optimization_tpu.solvers import tnt


def main():
    n = 1 << 24
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

    x = sphere().rand(jax.random.PRNGKey(0), n).astype(dtype)
    v = sphere().proj(x, jax.random.normal(jax.random.PRNGKey(1), (n,), dtype))
    k = 200

    def chain(op):
        @jax.jit
        def run(u):
            return jax.lax.fori_loop(0, k, lambda _, u: op(u), u)
        run(v).block_until_ready()
        t0 = time.perf_counter()
        run(v).block_until_ready()
        return 3 * 4 * n * k / (time.perf_counter() - t0) / 1e9

    gbps = chain(lambda u: diag_stencil_matvec(d, u, scale=1e-3))
    ceiling = chain(lambda u: stream3_probe(d, u, scale=1e-3))
    spec, kind = chip_bandwidth()

    params = tnt.TNTParams(
        max_iterations=30, max_TPCG_iterations=50, gradient_tolerance=1e-5,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0)
    x0 = sphere().rand(jax.random.PRNGKey(2), n).astype(dtype)
    res = tnt.solve(problem, x0, params)
    jax.block_until_ready(res.x)
    t0 = time.perf_counter()
    res = tnt.solve(problem, x0, params)
    jax.block_until_ready(res.x)
    dts = time.perf_counter() - t0
    outer = int(res.num_iterations)

    # faster-of-the-two as ceiling (probe == pipeline minus stencil math)
    frac = gbps / max(ceiling, gbps, 1e-9)
    emit("tnt_rayleigh_hv_roofline_frac", frac,
         f"fraction of measured 3-stream ceiling {ceiling:.0f} GB/s ({kind});"
         f" hv={gbps:.1f} GB/s = {gbps / spec:.2f} of {spec:.0f} spec; "
         f"{outer} outer it in {dts:.2f}s ({outer / dts:.2f} it/s), "
         f"f*={float(res.f):.4f}",
         frac / 0.80)


if __name__ == "__main__":
    main()
