"""SE(3) pose synchronization from a g2o file, end to end.

Pipeline: native C++ g2o loader (falls back to pure Python) -> SE-Sync-style
chordal/spectral initialization (LOBPCG on the connection Laplacian) ->
Riemannian TNT on SO(3)^n -> translation recovery via matrix-free LSQR.

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

from optimization_tpu.io import load_g2o, native_available
from optimization_tpu.models import pose_sync, rotation_sync as rs


def rotmat_to_quat(R):
    """Rotation matrix -> (x, y, z, w) via the standard largest-pivot
    extraction (branch on the largest of the trace and the three diagonal
    entries), which stays well-conditioned for rotations near pi — the
    w-only formula loses precision there and returns a fixed wrong axis in
    the degenerate branch."""
    t = np.trace(R)
    if t > max(R[0, 0], R[1, 1], R[2, 2]):
        s = 2.0 * np.sqrt(1.0 + t)
        return ((R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                (R[1, 0] - R[0, 1]) / s, 0.25 * s)
    i = int(np.argmax([R[0, 0], R[1, 1], R[2, 2]]))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = 2.0 * np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k])
    q = [0.0, 0.0, 0.0, (R[k, j] - R[j, k]) / s]
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    return (q[0], q[1], q[2], q[3])


def synthesize_g2o(path, n=64, noise=0.03, seed=0):
    """Write a noisy synthetic SE(3) pose graph in the g2o convention
    (M_e = R_i' R_j, t_e = R_i'(t_j - t_i))."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    R_true = rs.ROTATIONS.rand(k1, n, 3, 3)
    t_true = 3.0 * jax.random.normal(k2, (n, 3))

    src = jnp.arange(n - 1, dtype=jnp.int32)
    dst = src + 1
    src = jnp.concatenate(
        [src, jax.random.randint(k3, (2 * n,), 0, n, jnp.int32)])
    dst = jnp.concatenate(
        [dst, jax.random.randint(k4, (2 * n,), 0, n, jnp.int32)])

    Rt = jnp.swapaxes(R_true, -1, -2)
    Mij = jnp.einsum("eij,ejk->eik", Rt[src], R_true[dst])
    tij = jnp.einsum("eij,ej->ei", Rt[src], t_true[dst] - t_true[src])
    w = noise * jax.random.normal(k5, (src.shape[0], 3, 3))
    skew = 0.5 * (w - jnp.swapaxes(w, -1, -2))
    pert = rs._orthonormalize(jnp.eye(3) + skew + 0.5 * (skew @ skew))
    Mij = pert @ Mij
    tij = tij + noise * jax.random.normal(k5, tij.shape)

    info = np.zeros(21)
    info[[0, 6, 11, 15, 18, 20]] = 1.0
    info_s = " ".join(map(str, info))
    lines = []
    for e in range(int(src.shape[0])):
        x, y, z, qw = rotmat_to_quat(np.asarray(Mij[e], np.float64))
        tx, ty, tz = np.asarray(tij[e], np.float64)
        lines.append(
            f"EDGE_SE3:QUAT {int(src[e])} {int(dst[e])} "
            f"{tx:.12f} {ty:.12f} {tz:.12f} "
            f"{x:.12f} {y:.12f} {z:.12f} {qw:.12f} {info_s}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return np.asarray(R_true), np.asarray(t_true)


def main():
    if len(sys.argv) > 1:
        path, truth = sys.argv[1], None
    else:
        path = tempfile.NamedTemporaryFile(suffix=".g2o", delete=False).name
        truth = synthesize_g2o(path)
        print(f"synthesized pose graph -> {path}")

    g = load_g2o(path)
    print(f"loaded {path}: {g.n_vertices} poses, {len(g.src)} edges, "
          f"SE({g.dim}), native parser: {native_available()}")

    dtype = jnp.zeros(()).dtype
    res = pose_sync.solve_pose_graph(g, dtype=dtype, certify=True)
    rr = res.rotation_result
    print(f"rotations: status={int(rr.status)} f={float(rr.f):.6e} "
          f"|grad|={float(rr.gradfx_norm):.3e} "
          f"iters={int(rr.num_iterations)}")
    print(f"translations: LSQR residual={float(res.translation_residual):.3e}")
    c = res.certificate
    print(f"certificate: certified={bool(c.certified)} "
          f"lam_min={float(c.lam_min):.3e} "
          f"stationarity={float(c.stationarity):.2e}")

    if truth is not None:
        R_true, t_true = truth
        err_R, err_t = pose_sync.alignment_errors(
            res.R, res.t, jnp.asarray(R_true, dtype),
            jnp.asarray(t_true, dtype))
        print(f"gauge-aligned errors: rotations {float(err_R):.4f}, "
              f"translations (max) {float(err_t):.4f}")


if __name__ == "__main__":
    main()
