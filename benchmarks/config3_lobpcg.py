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

    def run():
        return lobpcg(A, T=T, m=m, nx=nx, nev=nev, max_iterations=100,
                      tau=1e-4, key=jax.random.PRNGKey(3))

    res = run()
    jax.block_until_ready(res.X)
    dt = timeit(lambda: run().X, iters=3)
    iters = int(res.num_iterations)
    err = float(np.max(np.abs(np.asarray(res.theta)
                              - np.arange(1, nev + 1, dtype=np.float64))))
    emit("lobpcg_1e5_iters_per_s", iters / dt,
         f"block iters/s (m={m}, nx={nx}, nev={nev}, {iters} iters, "
         f"max|theta-lambda|={err:.2e}, nc={int(res.num_converged)})",
         1.0 if err < 1e-2 else 0.0)


if __name__ == "__main__":
    main()
