"""Config 5: batched SO(3) rotation-synchronization TNT (the flagship),
scenario-sharded over the device mesh.

A fleet of B SE-Sync-style instances (n rotations each, spanning path + extra
edges) solved by Riemannian TNT on SO(3)^n, vmapped into one program and
DP-sharded.  Metric: aggregate TNT outer iterations/second; vs_baseline =
estimation-quality parity (mean gauge-aligned rotation error below the
injected noise level on every instance).
"""

import jax
import jax.numpy as jnp

from _util import emit, timeit

from optimization_tpu.models import rotation_sync as rs
from optimization_tpu.parallel import batch_mesh
from optimization_tpu.parallel.sharding import shard_batch
from optimization_tpu.solvers import tnt


def main():
    B = max(1, len(jax.devices())) * 2
    n, d, noise = 512, 3, 0.05
    # One shared edge topology, per-instance rotations/noise (vmappable)
    R_true, data = rs.random_fleet(jax.random.PRNGKey(0), B, n, d,
                                   extra_edges=2 * n, noise=noise)
    # SE-Sync pipeline: spectral (chordal) initialization per instance —
    # random inits land in local minima of the chordal cost at this density.
    R0 = jnp.stack([
        rs.spectral_init(
            rs.RotationSyncData(src=data.src, dst=data.dst, Rij=data.Rij[i]),
            n, d)
        for i in range(B)
    ]).astype(jnp.float32)

    problem = rs.make_problem()
    params = tnt.TNTParams(
        max_iterations=30, max_TPCG_iterations=40, gradient_tolerance=1e-3,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0)

    def one(R0_i, Rij_i):
        d_i = rs.RotationSyncData(src=data.src, dst=data.dst, Rij=Rij_i)
        return tnt.solve(problem, R0_i, params, data=d_i)

    mesh = batch_mesh()
    R0 = shard_batch(R0, mesh)
    Rijs = shard_batch(data.Rij, mesh)
    solve_fleet = jax.jit(jax.vmap(one))
    res = solve_fleet(R0, Rijs)
    jax.block_until_ready(res.x)
    dt = timeit(lambda: solve_fleet(R0, Rijs).x, iters=3)

    total_iters = int(jnp.sum(res.num_iterations))
    errs = jax.vmap(rs.mean_rotation_error)(res.x, R_true)
    max_err = float(jnp.max(errs))
    emit("rotation_sync_fleet_iters_per_s", total_iters / dt,
         f"aggregate TNT outer it/s (B={B}, n={n} rotations, "
         f"{total_iters} total iters, {dt:.2f}s/solve, "
         f"max mean-rot-err={max_err:.3f} @ noise={noise})",
         1.0 if max_err < 2.5 * noise else 0.0)


if __name__ == "__main__":
    main()
