"""Low-rank matrix completion on the Grassmann manifold (RTRMC-style).

Recovers a rank-4 400x300 matrix from 25% noisy observations: spectral
initialization, then Riemannian TNT over the column space with the batched
per-column ridge solve inside the objective (Boumal-Absil RTRMC — the
problem family built on exactly the trust-region machinery this suite
reimplements).

Run:  python examples/matrix_completion_example.py
"""

import sys
import time

import jax
import jax.numpy as jnp

from _common import report, setup

from optimization_tpu.models import matrix_completion as mc
from optimization_tpu.solvers import tnt


def main():
    setup()
    m, n, k, frac, noise = 400, 300, 4, 0.25, 0.01
    M_true, data = mc.random_instance(jax.random.PRNGKey(0), m, n, k,
                                      frac=frac, noise=noise, lam=1e-8)
    print(f"m x n = {m} x {n}, rank {k}, {frac:.0%} observed, "
          f"noise {noise}")

    U0 = mc.spectral_init(data, k)
    f32 = M_true.dtype == jnp.float32
    params = tnt.TNTParams(
        max_iterations=100, gradient_tolerance=(1e-4 if f32 else 1e-9),
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0, max_TPCG_iterations=200)

    t0 = time.time()
    res = tnt.solve(mc.make_problem(), U0, params, data=data)
    M_hat = mc.predict(res.x, data)
    rel = float(jnp.linalg.norm(M_hat - M_true)
                / jnp.linalg.norm(M_true))
    report("matrix-completion", res, t0,
           extra=f"rel-err(all entries)={rel:.2e} (noise {noise})")


if __name__ == "__main__":
    sys.exit(main())
