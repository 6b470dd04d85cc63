"""Pose-graph rotation synchronization from a g2o file, end to end.

Pipeline: native C++ g2o loader (falls back to pure Python) -> SE-Sync-style
spectral initialization (LOBPCG on the connection Laplacian) -> Riemannian
TNT on SO(3)^n, run through the host-chunked driver with verbose iteration
lines and a wall-clock budget.

Run: python examples/pose_graph_g2o.py [file.g2o]
(with no argument, a synthetic noisy pose graph is generated and written to
a temporary g2o file first, so the whole loader path is exercised).
"""

import sys
import tempfile

import numpy as np

from _common import setup

setup()

import jax
import jax.numpy as jnp

from optimization_tpu.core import driver
from optimization_tpu.io import load_g2o, native_available
from optimization_tpu.models import rotation_sync as rs
from optimization_tpu.solvers import tnt


def rotmat_to_quat(R):
    w = np.sqrt(max(0.0, 1 + np.trace(R))) / 2
    if w > 1e-9:
        return ((R[2, 1] - R[1, 2]) / (4 * w),
                (R[0, 2] - R[2, 0]) / (4 * w),
                (R[1, 0] - R[0, 1]) / (4 * w), w)
    return (1.0, 0.0, 0.0, 0.0)


def synthesize_g2o(path, n=64, noise=0.03, seed=0):
    """Write a noisy synthetic SE(3) pose graph (identity translations)."""
    R_true, data = rs.random_instance(
        jax.random.PRNGKey(seed), n, 3, extra_edges=2 * n, noise=noise)
    lines = []
    info = np.zeros(21)
    info[[0, 6, 11, 15, 18, 20]] = 1.0
    info_s = " ".join(map(str, info))
    for e in range(int(data.src.shape[0])):
        x, y, z, w = rotmat_to_quat(np.asarray(data.Rij[e], np.float64))
        lines.append(
            f"EDGE_SE3:QUAT {int(data.src[e])} {int(data.dst[e])} 0 0 0 "
            f"{x:.12f} {y:.12f} {z:.12f} {w:.12f} {info_s}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return np.asarray(R_true)


def main():
    if len(sys.argv) > 1:
        path, R_true = sys.argv[1], None
    else:
        path = tempfile.NamedTemporaryFile(suffix=".g2o", delete=False).name
        R_true = synthesize_g2o(path)
        print(f"synthesized pose graph -> {path}")

    g = load_g2o(path)
    print(f"loaded {path}: {g.n_vertices} poses, {len(g.src)} edges, "
          f"SE({g.dim}), native parser: {native_available()}")

    dtype = jnp.zeros(()).dtype
    data = rs.RotationSyncData(
        src=jnp.asarray(g.src), dst=jnp.asarray(g.dst),
        Rij=jnp.asarray(g.Rij, dtype))

    R0 = rs.spectral_init(data, g.n_vertices, g.dim)
    print("spectral init done; refining with TNT...")

    # f32's gradient-noise floor on this objective is ~1e-3; x64 goes to 1e-8
    gtol = 1e-8 if dtype == jnp.float64 else 2e-3
    params = tnt.TNTParams(
        max_iterations=100, gradient_tolerance=gtol,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0,
        max_computation_time=300.0, verbose=True)
    res = driver.drive(tnt, rs.make_problem(), R0.astype(dtype), params,
                       data=data, chunk_iterations=10)

    print(f"status={int(res.status)} f={float(res.f):.6e} "
          f"|grad|={float(res.gradfx_norm):.3e} "
          f"iters={int(res.num_iterations)}")
    if R_true is not None:
        err = float(rs.mean_rotation_error(
            res.x, jnp.asarray(R_true, dtype)))
        print(f"mean gauge-aligned rotation error vs truth: {err:.4f}")


if __name__ == "__main__":
    main()
