"""BASELINE config 4: batched LASSO via FISTA and ADMM, scenario-sharded.

Mirrors ``examples/proximal_gradient_example.cpp`` (group LASSO via FISTA)
and ``examples/ADMM_example.cpp`` (dense LASSO, Boyd Sec. 11.1), then runs a
scenario-sharded fleet of LASSO instances across all available devices (DP
over the mesh "batch" axis).  Run: python examples/lasso.py
"""

import time

import numpy as np

from _common import setup

setup()

import jax
import jax.numpy as jnp

from optimization_tpu import CompositeProblem
from optimization_tpu.parallel import batch_mesh
from optimization_tpu.parallel.sharding import shard_batch
from optimization_tpu.solvers import admm, proximal_gradient as pg
from optimization_tpu.solvers.prox import group_soft_threshold, soft_threshold


def fista_group_lasso():
    A = jnp.diag(jnp.array([1000.0, 1.0]))
    b = jnp.array([1.0, 1.0])
    mu = 10.0
    problem = CompositeProblem(
        f=lambda x, d: jnp.sum((A @ x - b) ** 2),
        g=lambda x, d: mu * jnp.linalg.norm(x),
        prox_g=lambda x, lam, d: group_soft_threshold(x, mu * lam))
    t0 = time.time()
    res = pg.solve(problem, jnp.array([4.0, 4.0]), pg.ProximalGradientParams(
        max_iterations=1000000, composite_gradient_tolerance=1e-4))
    print(f"[FISTA group-lasso] status={int(res.status)} "
          f"iters={int(res.num_iterations)} F={float(res.f):.6f} "
          f"x={res.x} wall={time.time() - t0:.2f}s")


def admm_lasso(m=600, n=2000, nnz=60):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(m, n))
    A /= np.linalg.norm(A, axis=0, keepdims=True)
    x_true = np.zeros(n)
    x_true[rng.integers(0, n, nnz)] = rng.normal(size=nnz)
    b = A @ x_true + rng.normal(size=m)
    Atb = A.T @ b
    mu = 0.1 * np.abs(Atb).max()

    A_j, Atb_j = jnp.asarray(A), jnp.asarray(Atb)
    AtA = A_j.T @ A_j

    problem = admm.ADMMProblem(
        minLx=lambda y, lam, rho, d: jax.scipy.linalg.solve(
            AtA + rho * jnp.eye(n), Atb_j + rho * y - lam, assume_a="pos"),
        minLy=lambda x, lam, rho, d: soft_threshold(x + lam / rho, mu / rho),
        A=lambda x, d: x, B=lambda y, d: -y, At=lambda r, d: r)
    params = admm.ADMMParams(max_iterations=250, eps_rel=1e-4,
                             eps_abs_pri=1e-2, eps_abs_dual=1e-2)
    t0 = time.time()
    res = admm.solve(problem, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), params)
    print(f"[ADMM lasso {m}x{n}] status={int(res.status)} "
          f"iters={int(res.num_iterations)} wall={time.time() - t0:.2f}s")


def sharded_fista_fleet(batch=8, m=128, n=512):
    """A fleet of LASSO instances, one per device (DP)."""
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(batch, m, n)) / np.sqrt(m))
    b = jnp.asarray(rng.normal(size=(batch, m)))
    mu = 0.05

    problem = CompositeProblem(
        f=lambda x, d: 0.5 * jnp.sum((d[0] @ x - d[1]) ** 2),
        g=lambda x, d: mu * jnp.sum(jnp.abs(x)),
        prox_g=lambda x, lam, d: soft_threshold(x, mu * lam))
    params = pg.ProximalGradientParams(
        max_iterations=5000, composite_gradient_tolerance=1e-6)

    n_dev = len(jax.devices())
    mesh = batch_mesh(min(n_dev, batch))
    data = shard_batch((A, b), mesh)
    x0s = shard_batch(jnp.zeros((batch, n)), mesh)

    solve1 = lambda x0, d: pg.solve(problem, x0, params, data=d)
    t0 = time.time()
    res = jax.jit(jax.vmap(solve1))(x0s, data)
    jax.block_until_ready(res.x)
    print(f"[FISTA fleet x{batch} on {n_dev} devices] "
          f"statuses={np.asarray(res.status)} wall={time.time() - t0:.2f}s")


if __name__ == "__main__":
    fista_group_lasso()
    admm_lasso()
    sharded_fista_fleet()
