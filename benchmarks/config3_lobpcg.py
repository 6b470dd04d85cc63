"""Config 3: LOBPCG smallest-5 eigenpairs of a 10^5-dim SPD operator.

The operator is diag(linspace(1, m)) (analytically known spectrum, mirroring
the reference's diagonal fixtures, ``LOBPCG_unit_test.cpp:52-75`` /
``LOBPCG_example.cpp:30-142`` scaled up 200x).

Two measurements:
- accuracy parity: a converged solve (tau=1e-4, exact-inverse
  preconditioner) must reach the f32 eigenvalue floor with nev converged —
  that is the vs_baseline gate;
- **sustained block iterations/second** (the headline value): a fixed
  50-iteration run (tau below the dtype floor so convergence never fires),
  which measures the three-block iteration engine itself rather than the
  ~3-iteration converged solve whose wall time is dispatch-dominated.
  The judge's round-2 target is 2x round-1's 171 it/s = 342.

vs_baseline = (sustained it/s / 342) when accuracy parity holds, else 0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from _util import emit, timeit

from optimization_tpu.linalg.lobpcg import lobpcg


def main():
    m, nx, nev = 100_000, 16, 5
    d = jnp.linspace(1.0, float(m), m, dtype=jnp.float32)
    A = lambda S: d[:, None] * S
    T = lambda S: S / d[:, None]   # exact inverse preconditioner

    # jit the whole solve so repeated calls reuse one compiled program (the
    # implicit while_loop would otherwise retrace + recompile per call)
    @jax.jit
    def run():
        return lobpcg(A, T=T, m=m, nx=nx, nev=nev, max_iterations=100,
                      tau=1e-4, key=jax.random.PRNGKey(3))

    res = run()
    jax.block_until_ready(res.X)
    iters = int(res.num_iterations)
    err = float(np.max(np.abs(np.asarray(res.theta)
                              - np.arange(1, nev + 1, dtype=np.float64))))
    # Accuracy floor in f32 is eps * |A| ~ 1.2e-2 (|A| = 1e5); x64 reaches
    # the reference's 1e-4 envelope (tests pin that on CPU).
    floor = 5e-2 if res.theta.dtype == jnp.float32 else 1e-4
    ok = err < floor and int(res.num_converged) >= nev

    # Sustained engine rate: fixed 50 iterations, convergence test disarmed.
    K = 50

    @jax.jit
    def sustained():
        return lobpcg(A, T=T, m=m, nx=nx, nev=nev, max_iterations=K,
                      tau=1e-30, key=jax.random.PRNGKey(3))

    r2 = sustained()
    jax.block_until_ready(r2.X)
    assert int(r2.num_iterations) == K
    dt = timeit(lambda: sustained().X, iters=3)
    rate = K / dt

    # Round-3 cheap-RR arm: one eigh per iteration (shifted-Cholesky
    # whitening).  Reported alongside; the headline stays the robust
    # default path for round-over-round comparability.
    @jax.jit
    def sustained_chol():
        return lobpcg(A, T=T, m=m, nx=nx, nev=nev, max_iterations=K,
                      tau=1e-30, key=jax.random.PRNGKey(3),
                      rr_method="chol")

    rc = sustained_chol()
    jax.block_until_ready(rc.X)
    # The chol path CAN stop early (RR breakdown sets done); divide by the
    # iterations actually run so a breakdown can't inflate the rate.
    k_chol = int(rc.num_iterations)
    rate_chol = k_chol / timeit(lambda: sustained_chol().X, iters=3)

    emit("lobpcg_1e5_iters_per_s", rate,
         f"sustained block iters/s over {K} fixed iterations "
         f"(m={m}, nx={nx}, nev={nev}); chol-RR arm {rate_chol:.0f} it/s "
         f"({k_chol}/{K} its, consistent={bool(rc.pencil_consistent)}); "
         f"converged solve: {iters} iters, "
         f"max|theta-lambda|={err:.2e} @ dtype floor {floor:.0e}, "
         f"nc={int(res.num_converged)}, "
         f"pencil_consistent={bool(res.pencil_consistent)}; "
         f"round-1: 171 it/s, target 2x = 342",
         (rate / 342.0) if ok else 0.0)


if __name__ == "__main__":
    main()
