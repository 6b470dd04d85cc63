"""Config 3: LOBPCG smallest-5 eigenpairs of a 10^5-dim SPD operator.

The operator is diag(linspace(1, m)) (analytically known spectrum, mirroring
the reference's diagonal fixtures, ``LOBPCG_unit_test.cpp:52-75`` /
``LOBPCG_example.cpp:30-142`` scaled up 200x).  Metric: LOBPCG iterations per
second; vs_baseline = eigenvalue accuracy parity (1.0 when max |theta - i-1|
< 1e-2 in f32).
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
    dt = timeit(lambda: run().X, iters=3)
    iters = int(res.num_iterations)
    err = float(np.max(np.abs(np.asarray(res.theta)
                              - np.arange(1, nev + 1, dtype=np.float64))))
    # Accuracy floor in f32 is eps * |A| ~ 1.2e-2 (|A| = 1e5); x64 reaches
    # the reference's 1e-4 envelope (tests pin that on CPU).
    floor = 5e-2 if res.theta.dtype == jnp.float32 else 1e-4
    emit("lobpcg_1e5_iters_per_s", iters / dt,
         f"block iters/s (m={m}, nx={nx}, nev={nev}, {iters} iters, "
         f"max|theta-lambda|={err:.2e} @ dtype floor {floor:.0e}, "
         f"nc={int(res.num_converged)})",
         1.0 if err < floor and int(res.num_converged) >= nev else 0.0)


if __name__ == "__main__":
    main()
