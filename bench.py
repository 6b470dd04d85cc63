"""Headline benchmark: TNT Hessian-vector throughput + solver iteration rate.

Runs on whatever backend is live (the real TPU chip under the driver).  The
flagship configuration is BASELINE config 2 at scale: Riemannian TNT
(Rayleigh-quotient minimization) on S^{n-1} with n = 2^24 and a structured
SPD operator A = diag(d) + 3-point stencil.  The Hv product is the fused
Pallas kernel ``diag_stencil_matvec`` (one pass: read d, read v, write Av —
the 3n-word minimum for this operator).

The headline value is hv_bandwidth / achievable_bandwidth, where the
achievable ceiling is measured in the same harness by ``stream3_probe`` — a
kernel with identical stream pattern/pipeline but no stencil work (the
roofline-model "attainable bandwidth" for a read-read-write op on this
platform; the spec sheet number and the spec fraction are reported alongside
in the unit string).  North-star target: >= 0.80 of roofline.

Prints exactly ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
where vs_baseline is value / 0.80 (>= 1.0 beats the target).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# Known HBM bandwidths (GB/s) per chip generation
HBM_GBPS = {
    "v5 lite": 819.0,   # TPU v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,       # Trillium
    "cpu": 50.0,        # nominal, so the script still runs off-TPU
}


def chip_bandwidth():
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return bw, kind
    return HBM_GBPS["cpu"], kind


def main():
    from optimization_tpu import RiemannianProblem
    from optimization_tpu.kernels import diag_stencil_matvec, stream3_probe
    from optimization_tpu.manifolds import sphere
    from optimization_tpu.solvers import tnt

    n = 1 << 24
    dtype = jnp.float32
    d = jnp.linspace(1.0, 1000.0, n, dtype=dtype)
    A_op = lambda v: diag_stencil_matvec(d, v)

    def f(x, dd):
        return jnp.dot(x, A_op(x))

    def quadratic_model(x, dd):
        # One A(x) evaluation per outer iterate, shared by every CG step:
        # Hv = proj_x(2 A v) - <x, 2 A x> v   (sphere Riemannian Hessian)
        Ax2 = 2.0 * A_op(x)
        g = sphere().proj(x, Ax2)
        rq = jnp.dot(x, Ax2)
        return g, lambda v: sphere().proj(x, 2.0 * A_op(v)) - rq * v

    problem = RiemannianProblem(
        f=f, manifold=sphere(),
        grad=lambda x, dd: sphere().proj(x, 2.0 * A_op(x)),
        quadratic_model=quadratic_model)

    x = sphere().rand(jax.random.PRNGKey(0), n).astype(dtype)
    v = sphere().proj(x, jax.random.normal(jax.random.PRNGKey(1), (n,), dtype))
    k = 200

    # --- raw Hv matvec throughput (the STPCG hot operator A) ---
    @jax.jit
    def matvec_chain(u):
        # Chain A applications (scale fused into the kernel) so per-dispatch
        # overhead amortizes; magnitudes stay bounded.
        return jax.lax.fori_loop(
            0, k, lambda _, u: diag_stencil_matvec(d, u, scale=1e-3), u)

    matvec_chain(v).block_until_ready()      # compile + warm
    t0 = time.perf_counter()
    matvec_chain(v).block_until_ready()
    dt = time.perf_counter() - t0
    bytes_per_iter = 3 * 4 * n               # read d, read v, write out
    gbps = bytes_per_iter * k / dt / 1e9

    # --- achievable ceiling for the same stream pattern (measured roofline) ---
    @jax.jit
    def probe_chain(u):
        # scale fused into the probe so both pipelines move exactly 3n words
        return jax.lax.fori_loop(
            0, k, lambda _, u: stream3_probe(d, u, scale=1e-3), u)

    probe_chain(v).block_until_ready()
    t0 = time.perf_counter()
    probe_chain(v).block_until_ready()
    dt_probe = time.perf_counter() - t0
    ceiling_gbps = bytes_per_iter * k / dt_probe / 1e9

    spec, kind = chip_bandwidth()
    # the probe is the same pipeline minus the stencil math; treat the
    # faster of the two as the attainable ceiling (run-to-run noise)
    frac = gbps / max(ceiling_gbps, gbps, 1e-9)

    # --- full TNT solve iteration rate at scale ---
    params = tnt.TNTParams(
        max_iterations=30, max_TPCG_iterations=50,
        gradient_tolerance=1e-5, relative_decrease_tolerance=0.0,
        stepsize_tolerance=0.0, preconditioned_gradient_tolerance=0.0)
    x0 = sphere().rand(jax.random.PRNGKey(2), n).astype(dtype)
    res = tnt.solve(problem, x0, params, data=None)       # compile + run
    jax.block_until_ready(res.x)
    t0 = time.perf_counter()
    res = tnt.solve(problem, x0, params, data=None)
    jax.block_until_ready(res.x)
    dt_solve = time.perf_counter() - t0
    outer = int(res.num_iterations)
    inner = int(jnp.nansum(jnp.where(jnp.arange(params.max_iterations) < outer,
                                     res.inner_iterations, 0)))
    iters_per_s = outer / dt_solve if dt_solve > 0 else 0.0

    result = {
        "metric": "tnt_hv_matvec_roofline_frac",
        "value": round(frac, 4),
        "unit": (f"fraction of measured 3-stream ceiling "
                 f"{ceiling_gbps:.0f} GB/s ({kind}); hv={gbps:.1f} GB/s "
                 f"= {gbps / spec:.2f} of {spec:.0f} GB/s spec; "
                 f"tnt {outer} outer / {inner} cg iters in {dt_solve:.2f}s "
                 f"on n=2^24 ({iters_per_s:.2f} outer it/s); "
                 f"f*={float(res.f):.4f}"),
        "vs_baseline": round(frac / 0.80, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
