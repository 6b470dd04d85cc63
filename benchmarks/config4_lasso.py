"""Config 4: batched LASSO, FISTA and ADMM, scenario-sharded (DP).

A fleet of B independent LASSO instances (m=1500, n=5000 dense — the
reference ADMM example's shape, ``ADMM_example.cpp:41-110``) is vmapped into
one XLA program and sharded over the available devices' "batch" axis.
Metric: aggregate FISTA iterations/second across the fleet (iterations x
batch / wall-time); vs_baseline = convergence parity (all scenarios hit the
composite-gradient tolerance).
"""

import jax
import jax.numpy as jnp

from _util import emit, timeit

from optimization_tpu import CompositeProblem
from optimization_tpu.parallel import batch_mesh
from optimization_tpu.parallel.sharding import shard_batch
from optimization_tpu.solvers import proximal_gradient as pg
from optimization_tpu.solvers.prox import soft_threshold


def main():
    B = max(1, len(jax.devices()))
    m, n = 1500, 5000
    key = jax.random.PRNGKey(0)
    kA, kx, kb = jax.random.split(key, 3)
    A = jax.random.normal(kA, (B, m, n), jnp.float32) / jnp.sqrt(m)
    x_true = jnp.where(
        jax.random.uniform(kx, (B, n)) < 0.01,
        jax.random.normal(kx, (B, n), jnp.float32), 0.0)
    b = jnp.einsum("bmn,bn->bm", A, x_true) \
        + 0.01 * jax.random.normal(kb, (B, m), jnp.float32)
    mu = 0.1

    problem = CompositeProblem(
        f=lambda x, d: 0.5 * jnp.sum((d["A"] @ x - d["b"]) ** 2),
        g=lambda x, d: mu * jnp.sum(jnp.abs(x)),
        prox_g=lambda x, lam, d: soft_threshold(x, lam * mu))
    params = pg.ProximalGradientParams(
        max_iterations=300, composite_gradient_tolerance=1e-3,
        relative_composite_gradient_tolerance=1e-6)

    def one(data):
        return pg.solve(problem, jnp.zeros((n,), jnp.float32), params, data)

    mesh = batch_mesh()
    data = shard_batch({"A": A, "b": b}, mesh)
    solve_fleet = jax.jit(jax.vmap(one))
    res = solve_fleet(data)
    jax.block_until_ready(res.x)
    dt = timeit(lambda: solve_fleet(data).x, iters=3)
    total_iters = int(jnp.sum(res.num_iterations))
    all_conv = bool(jnp.all(
        res.status == int(pg.ProximalGradientStatus.PROX_GRAD_RESIDUAL)))
    emit("fista_lasso_fleet_iters_per_s", total_iters / dt,
         f"aggregate FISTA it/s (B={B}, m={m}, n={n}, "
         f"{total_iters} total iters, {dt:.2f}s/solve)",
         1.0 if all_conv else 0.0)


if __name__ == "__main__":
    main()
