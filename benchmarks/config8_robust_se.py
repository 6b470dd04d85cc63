"""Config 8: outlier-robust SE(3) pose synchronization (GNC, marginalized).

Geman-McClure graduated non-convexity over the translation-marginalized
SE-Sync objective (``pose_sync.solve_robust_se``), reweighting both the
rotational (kappa) and translational (tau) channels per edge.  The instance
carries 20% corrupted edges — half full SE(3) outliers, half translation-
only outliers (correct rotation, wrong offset: invisible to rotation-only
GNC).

Metric: wall seconds for the full GNC schedule (6 stages).  vs_baseline =
robustness parity: 1.0 when the recovered poses sit at the inlier noise
floor and every corrupted edge's translation weight is driven to ~0.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from _util import emit

from optimization_tpu.models import pose_sync, rotation_sync as rs


def main():
    n, noise, seed = 300, 0.01, 9
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    R_true = rs.ROTATIONS.rand(key, n, 3, 3).astype(jnp.float32)
    t_true = jnp.asarray(rng.normal(size=(n, 3)) * 2.0, jnp.float32)
    src = np.concatenate([np.arange(n - 1), rng.integers(0, n, 3 * n)])
    dst = np.concatenate([np.arange(1, n), rng.integers(0, n, 3 * n)])
    keep = src != dst
    src = jnp.asarray(src[keep], jnp.int32)
    dst = jnp.asarray(dst[keep], jnp.int32)
    E = int(src.shape[0])

    Rt = jnp.swapaxes(R_true, -1, -2)
    Mij = jnp.einsum("eij,ejk->eik", Rt[src], R_true[dst])
    tij = jnp.einsum("eij,ej->ei", Rt[src], t_true[dst] - t_true[src])
    w = noise * jnp.asarray(rng.normal(size=(E, 3, 3)), jnp.float32)
    skew = 0.5 * (w - jnp.swapaxes(w, -1, -2))
    pert = rs._orthonormalize(jnp.eye(3, dtype=jnp.float32) + skew
                              + 0.5 * (skew @ skew))
    Mij = pert @ Mij
    tij = tij + noise * jnp.asarray(rng.normal(size=(E, 3)), jnp.float32)

    # 20% corrupted edges, capped at < half of each vertex's incident edges:
    # a vertex with a local *outlier majority* is fundamentally unidentifiable
    # (two equal-cost robust basins), so uncapped random corruption at this
    # scale almost surely plants a few hopeless vertices (binomial tail).
    n_out = int(0.2 * E)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, np.asarray(src), 1)
    np.add.at(deg, np.asarray(dst), 1)
    cap = np.maximum(1, (deg - 1) // 2)
    hit = np.zeros(n, np.int64)
    out_list = []
    for e in rng.permutation(E):
        i, j = int(src[e]), int(dst[e])
        if hit[i] < cap[i] and hit[j] < cap[j]:
            out_list.append(e)
            hit[i] += 1
            hit[j] += 1
            if len(out_list) == n_out:
                break
    out_idx = np.asarray(out_list)
    n_out = len(out_idx)
    full_out = out_idx[: n_out // 2]
    Mij = Mij.at[full_out].set(
        rs.ROTATIONS.rand(jax.random.PRNGKey(123), len(full_out), 3, 3)
        .astype(jnp.float32))
    tij_true = tij
    tij = tij.at[out_idx].set(
        jnp.asarray(rng.normal(size=(n_out, 3)) * 10.0, jnp.float32))

    t0 = time.perf_counter()
    rob = pose_sync.solve_robust_se(src, dst, Mij, tij, n)
    R, t, w_rot, w_tr = rob.R, rob.t, rob.w_rot, rob.w_tr
    jax.block_until_ready(t)
    wall = time.perf_counter() - t0

    rot_err, t_err = pose_sync.alignment_errors(
        R.astype(jnp.float64), t.astype(jnp.float64),
        R_true.astype(jnp.float64), t_true.astype(jnp.float64))
    w_tr_np = np.asarray(w_tr)
    w_rot_np = np.asarray(w_rot)
    inlier = np.setdiff1d(np.arange(E), out_idx)
    # Only *genuinely inconsistent* corrupted edges must be rejected: a
    # random replacement that lands near the true offset is, in fact, an
    # inlier measurement and its weight correctly stays ~1.
    offset_err = np.linalg.norm(
        np.asarray(tij - tij_true)[out_idx], axis=1)
    hard = out_idx[offset_err > 1.0]
    ok = (float(rot_err) < 5 * noise
          and float(t_err) < 10 * noise
          and w_tr_np[hard].max() < 0.05
          and w_rot_np[full_out].max() < 0.05
          and np.median(w_rot_np[inlier]) > 0.5)
    emit("robust_se3_gnc_wall_s", wall,
         f"GM-GNC marginalized SE(3), n={n}, E={E}, 20% outliers "
         f"(half translation-only, capped below per-vertex majority); "
         f"rot_err={float(rot_err):.4f} t_err={float(t_err):.4f} "
         f"(noise {noise}); max w_tr[hard outlier]={w_tr_np[hard].max():.3f}"
         f" ({len(hard)}/{n_out}), "
         f"median w[inlier]={np.median(w_rot_np[inlier]):.2f}",
         1.0 if ok else 0.0)


if __name__ == "__main__":
    main()
