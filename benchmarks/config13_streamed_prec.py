"""Config 13: preconditioned STREAMED (>VMEM) subproblem engine at n=2^24.

VERDICT round 4, missing 1/2: the whole-loop streamed Pallas kernel
(``kernels/streamed_cg.py``) had no preconditioner seam, so every
ill-conditioned problem too big for VMEM forfeited the 0.80-of-spec tier.
Round 5 ports the elementwise M^{-1/2} folding (``linalg/flat_cg
._fold_prec`` — the reference's hot-loop-native preconditioning,
``IterativeSolvers.h:236-252,388-420``) into the kernel's registers
(``stpcg_flat_streamed(prec_chunk=, prec=)``): the operator family
diag + (w .* x) B (w .* x)' is CLOSED under elementwise folding, so the
preconditioner costs ZERO extra streams per iteration (one 2n-word
un-transform pass per subproblem).

Fixture: f32 TNT Rayleigh quotient on S^(2^24 - 1) with diagonal spread
kappa = 1e5 (the VERDICT-prescribed regime where the preconditioned XLA
flat engine was the round-4 best).  Both arms run the SAME half-power
Jacobi preconditioner P = (|2a - rq| + 1)^(-1/4) — strong enough to make
the solve converge (unpreconditioned CG stalls at the iteration cap on
this spread), weak enough that the solve still spends its time in
streamed CG passes rather than outer-iteration overhead — at identical
fixed effort (30 outer iterations):

  (a) XLA flat engine via ``problem.flat_prec``    (round-4 best)
  (b) streamed Pallas kernel via ``problem.flat_solve`` folding
      ``prec_chunk``/``prec``                      (round-5 path)

Metric: net wall(a) / net wall(b) — >= 1.0 means the streamed kernel wins
in the preconditioned >VMEM regime.  The ok gate requires trajectory
agreement (matching f*, inner-iteration counts within 10%) so the ratio
compares identical work; both walls are single warm solves net of the
measured tunnel dispatch charge (bench.py methodology).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from _util import emit   # noqa: F401  (inserts the repo root on sys.path)

import bench

from optimization_tpu import RiemannianProblem
from optimization_tpu.linalg.flat_cg import (sphere_rayleigh_flat,
                                             sphere_rayleigh_step)
from optimization_tpu.manifolds import sphere
from optimization_tpu.solvers import tnt

N = 1 << 24
KAPPA = 1e5


def build(streamed: bool):
    n = N
    b = (KAPPA - 1.0) / (n - 1)
    M = sphere()

    def A_elem(v):
        i = jax.lax.iota(jnp.float32, n)
        return (1.0 + b * i) * v.astype(jnp.float32)

    def f(x, dd):
        return jnp.dot(x.astype(jnp.float32), A_elem(x))

    def grad(x, dd):
        return M.proj(x, (2.0 * A_elem(x)).astype(jnp.float32))

    def flat_qm(x, dd, aux=None):
        rq = aux.rq if aux is not None else None
        A0, U, B, _ = sphere_rayleigh_flat(x, A_elem, rq=rq)
        return A0, U, B      # no init threading with a preconditioner

    def _pfull(rq):
        # half-power Jacobi: v -> (|2a - rq| + 1)^(-1/4) v
        def apply(v):
            a = 1.0 + b * jax.lax.iota(jnp.float32, n)
            d = jnp.abs(2.0 * a - rq) + 1.0
            return v * jax.lax.rsqrt(jnp.sqrt(d))
        return apply

    def flat_prec(x, dd):
        rq = jnp.dot(x.astype(jnp.float32), 2.0 * A_elem(x))
        return _pfull(rq)

    flat_solve = None
    if streamed:
        from optimization_tpu.kernels.streamed_cg import (
            sphere_rayleigh_streamed, stpcg_flat_streamed)

        def a_chunk(i0, aux, cr=2048):
            row = (jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 0)
                   .astype(jnp.float32) + jnp.asarray(i0, jnp.float32))
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (cr, 128), 1).astype(jnp.float32)
            return 1.0 + jnp.asarray(b, jnp.float32) * (row * 128.0 + lane)

        a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)

        def prec_chunk(i0, aux):
            d = jnp.abs(2.0 * a_chunk(i0, aux) - aux[0]) + 1.0
            return jax.lax.rsqrt(jnp.sqrt(d))

        def flat_solve(g, x, dd, aux, Delta, prm):
            rq = aux.rq
            return stpcg_flat_streamed(
                g, x, B_fn(rq), Delta, aux_scalars=(rq,), a0_chunk=a0c,
                weights=weights, max_iterations=prm.max_TPCG_iterations,
                kappa_fgr=prm.kappa_fgr, theta=prm.theta,
                prec_chunk=prec_chunk, prec=_pfull(rq))

    return RiemannianProblem(f=f, manifold=M, grad=grad, flat_qm=flat_qm,
                             flat_prec=flat_prec, flat_solve=flat_solve,
                             step_eval=sphere_rayleigh_step(A_elem)), M


def run_arm(streamed: bool, params, x0, x1):
    problem, _ = build(streamed)
    res = tnt.solve(problem, x0, params)            # compile + warm
    float(res.f)
    t0 = time.perf_counter()
    res = tnt.solve(problem, x1, params)
    fstar = float(res.f)                            # host-transfer close
    dt = time.perf_counter() - t0
    outer = int(res.num_iterations)
    inner = int(np.nansum(np.where(
        np.arange(params.max_iterations) < outer,
        np.asarray(res.inner_iterations), 0)))
    return dt, outer, inner, fstar, float(res.gradfx_norm)


def main():
    bench.check_backend_alive()
    M = sphere()
    params = tnt.TNTParams(
        max_iterations=30, max_TPCG_iterations=100,
        gradient_tolerance=1e-6, relative_decrease_tolerance=0.0,
        stepsize_tolerance=0.0, preconditioned_gradient_tolerance=0.0)
    x0 = M.rand(jax.random.PRNGKey(2), N).astype(jnp.float32)
    x1 = M.rand(jax.random.PRNGKey(3), N).astype(jnp.float32)

    dt_x, out_x, in_x, f_x, g_x = run_arm(False, params, x0, x1)
    dt_s, out_s, in_s, f_s, g_s = run_arm(True, params, x0, x1)

    charge = bench.measure_dispatch_charge()
    net_x = max(dt_x - charge, 1e-9)
    net_s = max(dt_s - charge, 1e-9)
    ratio = net_x / net_s

    # trajectory agreement: both arms did the same preconditioned work
    ok = (abs(f_x - f_s) <= 1e-3 * abs(f_x)
          and abs(in_x - in_s) <= 0.1 * max(in_x, in_s)
          and out_x == out_s)
    spec, kind = bench.chip_bandwidth()
    gbps_s = 5 * N * 4 * in_s / net_s / 1e9    # pair body: 5n words avg f32
    emit("streamed_prec_speedup_vs_xla_prec",
         round(ratio, 3),
         f"preconditioned >VMEM subproblem engine A/B at f32 n=2^24, "
         f"kappa={KAPPA:.0e} ({kind}): XLA flat_prec {net_x:.2f}s net "
         f"({out_x} outer / {in_x} cg, f*={f_x:.5f}, |g|={g_x:.1e}) vs "
         f"streamed kernel prec_chunk {net_s:.2f}s net ({out_s} outer / "
         f"{in_s} cg, f*={f_s:.5f}, |g|={g_s:.1e}, {in_s / net_s:.0f} cg "
         f"it/s, ~{gbps_s:.0f} GB/s = {gbps_s / spec:.2f} of spec at 5n "
         f"words/iter); identical half-power Jacobi M^(-1/2) both arms, "
         f"net of {charge * 1e3:.0f} ms/dispatch charge; ok gate = "
         f"matching trajectory"
         + ("" if ok else "; WARNING trajectory mismatch — metric zeroed"),
         ratio if ok else 0.0)


if __name__ == "__main__":
    main()
