"""Config 7: bf16-storage / f32-accumulate TNT at n = 2^26.

The single-chip scale tier (SURVEY.md section 7.3 double-precision risk):
at n = 2^26 the CG working set in f32 (x, g + s/r/v/p + operator scratch)
crowds a 16 GB chip; storing all iterate vectors in bf16 halves the memory
footprint *and* the per-iteration HBM traffic, while every reduction
(metric inner products, CG recurrences, trust-region scalars) accumulates
in f32 — the sphere manifold promotes sub-f32 storage for accumulation and
``stpcg`` casts its axpy updates back to the storage dtype.

Metric: TNT outer iterations/s at n=2^26 in bf16 storage.  vs_baseline =
convergence parity: 1.0 when the Rayleigh quotient reaches the documented
bf16 floor (f* = 1 + O(1e-2)) with a unit-norm final iterate.

Measured (round 4, v5e): **27.0 outer it/s on the streamed Pallas kernel
vs 13.6 on the XLA generic engine — 1.98x** at the identical trajectory
(15 outer / 351 cg, f* = 1.0185 both; OPTTPU_CONFIG7_ENGINE=xla is the
baseline arm).  Round 3 recorded 13.5 it/s.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from _util import emit

from optimization_tpu import RiemannianProblem
from optimization_tpu.manifolds import sphere
from optimization_tpu.solvers import tnt


def main():
    n = 1 << 26
    dtype = jnp.bfloat16
    M = sphere()
    b = 999.0 / (n - 1)

    def A_op(v):
        # affine diagonal 1..1000 generated on the fly (f32 accumulate)
        i = jax.lax.iota(jnp.float32, n)
        return (1.0 + b * i) * v.astype(jnp.float32)

    def f(x, dd):
        return jnp.dot(x.astype(jnp.float32), A_op(x))

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

    # Round-4 subproblem engine: the whole-loop streamed Pallas kernel in
    # its bf16 / streamed-x mode (x alone is 128 MiB at 2^26, past the
    # VMEM pin budget).  Measured A/B at this regime
    # (benchmarks/probe_streamed_bf16.py): 761.8 CG it/s (0.75 of spec at
    # 6n avg words) vs 528.1 for the XLA pair body (0.61 at 7n) — 1.44x.
    # OPTTPU_CONFIG7_ENGINE=xla reverts to the generic-engine baseline.
    flat_solve = None
    if os.environ.get("OPTTPU_CONFIG7_ENGINE", "stream") != "xla":
        from optimization_tpu.kernels.streamed_cg import (
            sphere_rayleigh_streamed, stpcg_flat_streamed)

        def a_chunk(i0, aux, cr=2048):
            row = (jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 0)
                   .astype(jnp.float32) + jnp.asarray(i0, jnp.float32))
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (cr, 128), 1).astype(jnp.float32)
            return 1.0 + jnp.asarray(b, jnp.float32) * (row * 128.0 + lane)

        a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)

        def flat_solve(g, x, dd, aux, Delta, prm):
            rq = jnp.dot(x.astype(jnp.float32), 2.0 * A_op(x))
            return stpcg_flat_streamed(
                g, x, B_fn(rq), Delta, aux_scalars=(rq,), a0_chunk=a0c,
                weights=weights, max_iterations=prm.max_TPCG_iterations,
                kappa_fgr=prm.kappa_fgr, theta=prm.theta)

    problem = RiemannianProblem(f=f, manifold=M, grad=grad,
                                quadratic_model=quadratic_model,
                                flat_solve=flat_solve)
    x0 = M.rand(jax.random.PRNGKey(2), n).astype(dtype)
    params = tnt.TNTParams(
        max_iterations=30, max_TPCG_iterations=50,
        gradient_tolerance=0.5, relative_decrease_tolerance=0.0,
        stepsize_tolerance=0.0, preconditioned_gradient_tolerance=0.0)

    res = tnt.solve(problem, x0, params, data=None)
    float(res.f)          # timing must close with a HOST TRANSFER:
    t0 = time.perf_counter()   # block_until_ready returns early on the
    res = tnt.solve(problem, x0, params, data=None)   # axon runtime
    float(res.f)
    dt = time.perf_counter() - t0

    outer = int(res.num_iterations)
    inner = int(np.nansum(np.where(np.arange(params.max_iterations) < outer,
                                   np.asarray(res.inner_iterations), 0)))
    fstar = float(res.f)
    nrm = float(jnp.linalg.norm(res.x.astype(jnp.float32)))
    ok = (res.x.dtype == dtype and abs(nrm - 1.0) < 0.01
          and abs(fstar - 1.0) < 0.05)
    emit("tnt_bf16_2p26_iters_per_s", outer / dt if dt > 0 else 0.0,
         f"TNT outer it/s at n=2^26, bf16 storage / f32 accumulate "
         f"({outer} outer / {inner} cg in {dt:.2f}s; f*={fstar:.4f} "
         f"vs 1.0 exact, |x|={nrm:.4f}, dtype={res.x.dtype})",
         1.0 if ok else 0.0)


if __name__ == "__main__":
    main()
