"""Decompose the headline TNT's per-outer fixed cost (run on the real TPU).

bench.py's two-point fit puts the outer-iteration overhead at ~2.5-3 ms
with +-0.7 ms noise — too coarse to decide whether the flat engine's init
group, the while-loop entry, or the trust-region epilogue is the floor
(docs/ROADMAP.md "Outer-iteration overhead").  This probe measures the
pieces directly, each as a chain of C data-dependent calls inside ONE jit
so the ~0.6 ms tunnel dispatch charge amortizes away:

  A. ``stpcg_flat`` at max_iterations in {2, 26}: the slope gives the
     marginal per-CG-iteration cost, the intercept the engine's
     init-group + loop-entry charge.
  B. ``step_eval`` chains: the fused trial-evaluation pass + sync.
  C. whole TNT solves at max_TPCG in {25, 50} (bench.py's fit, reproduced
     with the chained methodology): per-outer total minus A-intercept
     minus B = the residual TR logic / trace / dispatch-free glue.

Usage: ``python benchmarks/probe_outer.py [n_log2=24] [dtype=bf16|f32]``.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from optimization_tpu.linalg.flat_cg import (sphere_rayleigh_flat,
                                             sphere_rayleigh_step,
                                             stpcg_flat)

N_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
DT = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bf16") \
    else jnp.float32
N = 1 << N_LOG2
C = 8      # chained calls per jit
REPS = 3


def _materialize(out):
    import numpy as _np
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            _np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def timeit(fn, *args):
    out = fn(*args)
    _materialize(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _materialize(out)
        best = min(best, time.perf_counter() - t0)
    return best


def A_elem(v):
    i = jax.lax.iota(jnp.float32, N)
    b = 999.0 / (N - 1)
    return (1.0 + b * i) * v.astype(jnp.float32)


def mk_x(key):
    x = jax.random.uniform(jax.random.PRNGKey(key), (N,), jnp.float32,
                           0.5, 1.0)
    return (x / jnp.sqrt(jnp.dot(x, x))).astype(DT)


def probe_engine():
    """A: chained stpcg_flat; slope = per-CG-iter, intercept = init+entry."""
    x0 = mk_x(0)
    g0 = mk_x(1)

    def chain(m_its):
        @jax.jit
        def run(x, g):
            tot = jnp.zeros((), jnp.float32)
            for _ in range(C):
                A0, U, B, rq = sphere_rayleigh_flat(x, A_elem)
                res = stpcg_flat(g, A0, U, B, jnp.asarray(1e9, jnp.float32),
                                 max_iterations=m_its, kappa_fgr=1e-6,
                                 theta=1.0)
                tot = tot + res.update_step_M_norm
                # data dependence: perturb g with the result's scalar
                g = (g.astype(jnp.float32)
                     * (1.0 + 1e-12 * res.update_step_M_norm)).astype(DT)
            return g, tot
        return run

    lo, hi = 2, 26
    t_lo = timeit(chain(lo), x0, g0)
    t_hi = timeit(chain(hi), x0, g0)
    per_iter = (t_hi - t_lo) / ((hi - lo) * C)
    init = t_lo / C - lo * per_iter
    print(f"A stpcg_flat per-CG-iter      {per_iter * 1e3:7.3f} ms "
          f"({1.0 / per_iter:6.0f} it/s)", flush=True)
    print(f"A stpcg_flat init+loop-entry  {init * 1e3:7.3f} ms/call",
          flush=True)
    return per_iter, init


def probe_step_eval():
    """B: chained fused trial-step evaluations."""
    step = sphere_rayleigh_step(A_elem)
    x0 = mk_x(2)
    h0 = (0.01 * mk_x(3).astype(jnp.float32)).astype(DT)

    @jax.jit
    def run(x, h):
        tot = jnp.zeros((), jnp.float32)
        for _ in range(C):
            x, f, grad, gn, aux = step(x, h, None)
            h = (-0.01 * grad).astype(DT)
            tot = tot + f
        return x, tot

    t = timeit(run, x0, h0) / C
    print(f"B step_eval fused pass        {t * 1e3:7.3f} ms/call",
        flush=True)
    return t


def probe_tnt():
    """C: whole TNT solves at two inner caps (chained methodology is not
    possible across solves — one solve is already one program — so this
    is bench.py's two-point fit at REPS best-of)."""
    from optimization_tpu import RiemannianProblem
    from optimization_tpu.manifolds import sphere
    from optimization_tpu.solvers import tnt

    M = sphere()

    def f(x, dd):
        return jnp.dot(x.astype(jnp.float32), A_elem(x))

    def grad(x, dd):
        return M.proj(x, (2.0 * A_elem(x)).astype(DT))

    def flat_qm(x, dd, aux=None):
        rq = aux.rq if aux is not None else None
        A0, U, B, _ = sphere_rayleigh_flat(x, A_elem, rq=rq)
        return A0, U, B, (aux.init if aux is not None else None)

    problem = RiemannianProblem(f=f, manifold=M, grad=grad, flat_qm=flat_qm,
                                step_eval=sphere_rayleigh_step(A_elem))

    def solve_time(cap):
        params = tnt.TNTParams(
            max_iterations=30, max_TPCG_iterations=cap,
            gradient_tolerance=0.0, relative_decrease_tolerance=0.0,
            stepsize_tolerance=0.0, preconditioned_gradient_tolerance=0.0)
        x0 = mk_x(4)

        def run(x):
            res = tnt.solve(problem, x, params, data=None)
            return res

        res = run(x0)
        _materialize(res.f)
        best, inner, outer = float("inf"), 0, 0
        for _ in range(REPS):
            t0 = time.perf_counter()
            res = run(x0)
            _materialize(res.f)
            best = min(best, time.perf_counter() - t0)
        outer = int(res.num_iterations)
        inner = int(jnp.nansum(jnp.where(
            jnp.arange(30) < outer, res.inner_iterations, 0)))
        return best, outer, inner

    t25, o25, i25 = solve_time(25)
    t50, o50, i50 = solve_time(50)
    if i50 == i25 or o50 == 0:
        print("C TNT fit degenerate (same inner counts)", flush=True)
        return
    per_cg = (t50 - t25) / (i50 - i25)
    per_outer = max(t50 - i50 * per_cg, 0.0) / o50
    print(f"C TNT two-point per-CG-iter   {per_cg * 1e3:7.3f} ms", flush=True)
    print(f"C TNT per-outer fixed         {per_outer * 1e3:7.3f} ms "
          f"({o50} outer / {i50} cg in {t50:.2f}s)", flush=True)
    return per_cg, per_outer


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} n=2^{N_LOG2} dtype="
          f"{jnp.dtype(DT).name} chain={C}", flush=True)
    per_iter, init = probe_engine()
    t_step = probe_step_eval()
    out = probe_tnt()
    if out:
        per_cg, per_outer = out
        resid = per_outer - init - t_step
        print(f"=> residual glue (TR logic + traces + entry) "
              f"{resid * 1e3:7.3f} ms/outer", flush=True)
