"""Headline benchmark: TNT trust-region CG throughput at n = 2^24.

BASELINE config 2 at scale: Riemannian TNT (Rayleigh-quotient minimization)
on S^{n-1}, n = 2^24, with the SPD operator A = diag(1 + b*i) (the
reference's LinSpaced diagonal fixtures, ``LOBPCG_unit_test.cpp:52-75``,
scaled up; the diagonal is generated on the fly, so the Hessian application
is a pure 2-stream elementwise map).

Round-2 engine: the trust-region subproblem runs in the single-
synchronization flat CG (``linalg/flat_cg.py``) — Chronopoulos-Gear
recurrences + the structured sphere Hessian  P H P = A0 + U B U'  make each
CG iteration ONE fused memory pass with ONE reduction sync (q = Hp and
y = 2Ax are recomputed elementwise in-pass; the s update is merged across
pairs of unrolled iterations), moving ~6n words per iteration where the
round-1 structure moved ~14n across several passes and syncs.

Headline value: CG iterations/second for the full TNT solve (compile
excluded, outer-iteration overhead included).  Round-1 measured 674 CG
iters/s on this config; the round-2 target set by the judge is 1.7x = 1146.
vs_baseline = value / 1146 (>= 1.0 beats the target).  The unit string
carries the effective HBM bandwidth (10n words per CG iteration / wall
time) and its fraction of the 819 GB/s v5e spec for context.

Prints exactly ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
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


# Round-1 reference point on this config (BENCH_r01): 1126 CG iterations in
# 1.67 s end-to-end = 674 CG it/s; judge's round-2 target is 1.7x.
R1_CG_PER_S = 674.0
TARGET_CG_PER_S = 1.7 * R1_CG_PER_S


def main():
    from optimization_tpu import RiemannianProblem
    from optimization_tpu.linalg.flat_cg import sphere_rayleigh_flat
    from optimization_tpu.manifolds import sphere
    from optimization_tpu.solvers import tnt

    n = 1 << 24
    dtype = jnp.float32
    b = 999.0 / (n - 1)

    def A_elem(v):
        i = jax.lax.iota(dtype, n)
        return (1.0 + b * i) * v

    M = sphere()

    def f(x, dd):
        return jnp.dot(x, A_elem(x))

    def grad(x, dd):
        return M.proj(x, 2.0 * A_elem(x))

    def flat_qm(x, dd):
        A0, U, B, _ = sphere_rayleigh_flat(x, A_elem)
        return A0, U, B

    problem = RiemannianProblem(f=f, manifold=M, grad=grad, flat_qm=flat_qm)

    params = tnt.TNTParams(
        max_iterations=30, max_TPCG_iterations=50,
        gradient_tolerance=1e-5, relative_decrease_tolerance=0.0,
        stepsize_tolerance=0.0, preconditioned_gradient_tolerance=0.0)
    x0 = M.rand(jax.random.PRNGKey(2), n).astype(dtype)

    res = tnt.solve(problem, x0, params, data=None)       # compile + warm
    float(res.f)
    # Time with a DIFFERENT initial point, and close the timed region with a
    # host transfer (float(res.f)): on this runtime block_until_ready can
    # return before the remote execution finishes, timing only the dispatch.
    x1 = M.rand(jax.random.PRNGKey(3), n).astype(dtype)
    t0 = time.perf_counter()
    res = tnt.solve(problem, x1, params, data=None)
    float(res.f)
    dt = time.perf_counter() - t0

    outer = int(res.num_iterations)
    inner = int(jnp.nansum(jnp.where(jnp.arange(params.max_iterations) < outer,
                                     res.inner_iterations, 0)))
    cg_per_s = inner / dt if dt > 0 else 0.0

    # Effective HBM traffic of the flat CG iteration: the fused pass reads
    # r/p/x and writes r/p every iteration, plus s read+write every OTHER
    # iteration (merged s update) -> avg 6n words; q and y=2Ax are
    # recomputed elementwise in-pass, the affine diagonal from iota.
    words = 6 * n
    gbps = words * 4 * inner / dt / 1e9 if dt > 0 else 0.0
    spec, kind = chip_bandwidth()

    result = {
        "metric": "tnt_flat_cg_iters_per_s",
        "value": round(cg_per_s, 1),
        "unit": (f"CG iterations/s, TNT Rayleigh-quotient on S^(2^24-1) "
                 f"({kind}); {outer} outer / {inner} cg in {dt:.2f}s; "
                 f"single-sync flat CG moves ~6n words/iter -> "
                 f"{gbps:.0f} GB/s effective = {gbps / spec:.2f} of "
                 f"{spec:.0f} GB/s spec; f*={float(res.f):.4f} (exact 1.0); "
                 f"round-1: {R1_CG_PER_S:.0f} cg it/s, target 1.7x = "
                 f"{TARGET_CG_PER_S:.0f}"),
        "vs_baseline": round(cg_per_s / TARGET_CG_PER_S, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
