"""BASELINE config 5: batched Riemannian TNT rotation synchronization.

SE-Sync-style: estimate n absolute rotations from noisy relative rotations by
TNT over SO(d)^n, then a vmapped fleet of instances sharded over the mesh
"batch" axis (the multi-host pod-slice configuration runs the same code over
a larger mesh).  Run: python examples/rotation_sync_example.py
"""

import time

import numpy as np

from _common import setup

setup()

import jax
import jax.numpy as jnp

from optimization_tpu.models import rotation_sync as rs
from optimization_tpu.parallel import batch_mesh
from optimization_tpu.parallel.sharding import shard_batch
from optimization_tpu.solvers import tnt


def main():
    f64 = jnp.zeros(()).dtype == jnp.float64
    tol = 1e-8 if f64 else 1e-4
    n, d = 64, 3

    problem = rs.make_problem()
    key = jax.random.PRNGKey(0)
    R_true, data = rs.random_instance(key, n, d, extra_edges=2 * n,
                                      noise=0.05,
                                      dtype=jnp.float64 if f64 else jnp.float32)
    # SE-Sync pipeline: chordal (spectral) initialization via LOBPCG on the
    # connection Laplacian, then TNT refinement.
    R0 = rs.spectral_init(data, n, d).astype(R_true.dtype)

    params = tnt.TNTParams(
        max_iterations=200, gradient_tolerance=tol,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0)

    t0 = time.time()
    res = tnt.solve(problem, R0, params, data=data)
    err = rs.mean_rotation_error(res.x, R_true)
    print(f"[rotation-sync n={n}] status={int(res.status)} "
          f"iters={int(res.num_iterations)} f={float(res.f):.4e} "
          f"aligned-err={float(err):.4f} wall={time.time() - t0:.2f}s")

    # --- batched fleet (DP over the mesh batch axis): one shared edge
    # topology, per-instance measurements, spectral init per instance ---
    B = 4
    _, datas = rs.random_fleet(jax.random.PRNGKey(7), B, n, d,
                               extra_edges=2 * n, noise=0.05,
                               dtype=R_true.dtype)
    R0s = jnp.stack([
        rs.spectral_init(rs.RotationSyncData(src=datas.src, dst=datas.dst,
                                             Rij=datas.Rij[i]), n, d)
        for i in range(B)]).astype(R_true.dtype)

    mesh = batch_mesh(min(B, len(jax.devices())))
    R0s = shard_batch(R0s, mesh)
    Rijs = shard_batch(datas.Rij, mesh)

    solve1 = lambda r0, rij: tnt.solve(
        problem, r0, params,
        data=rs.RotationSyncData(src=datas.src, dst=datas.dst, Rij=rij))
    t0 = time.time()
    out = jax.jit(jax.vmap(solve1))(R0s, Rijs)
    jax.block_until_ready(out.x)
    print(f"[rotation-sync fleet x{B}] statuses={np.asarray(out.status)} "
          f"f={np.asarray(out.f).round(4)} wall={time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
