"""SE(d) pose synchronization — the full SE-Sync pipeline.

The reference solver suite is the engine behind SE-Sync (certifiable pose
synchronization).  This model composes the framework's pieces into that
pipeline for standard g2o pose graphs:

1. **Rotation stage**: chordal/spectral initialization (LOBPCG on the
   connection Laplacian) + Riemannian TNT refinement on SO(d)^n
   (``models/rotation_sync.py``).
2. **Translation stage**: with rotations fixed, translation recovery is a
   sparse linear least-squares problem solved matrix-free by our LSQR
   (``linalg/lsqr.py``) over the graph incidence operator.

**Measurement convention.**  A g2o edge (i, j) stores the relative pose of j
in frame i:  ``M_e ~= R_i' R_j`` and ``t_e ~= R_i' (t_j - t_i)``.  The
rotation-sync chordal model measures world-frame ratios ``R_i R_j'``
(left-multiplying).  The two are reconciled exactly by solving the chordal
model in *transposed* variables Q_k = R_k':

    |R_j - R_i M_e|_F  =  |Q_j - M_e' Q_i|_F,

i.e. rotation-sync over edges (src=j, dst=i) with measurements M_e', then
R = Q'.  No approximation is involved.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..linalg.lsqr import lsqr
from ..solvers import tnt
from . import rotation_sync as rs

__all__ = ["PoseSyncResult", "solve_pose_graph", "recover_translations",
           "alignment_errors"]


class PoseSyncResult(NamedTuple):
    R: jnp.ndarray           # (n, d, d) world-frame rotations
    t: jnp.ndarray           # (n, d) world-frame translations (anchor at 0)
    rotation_result: Any     # TNTResult of the rotation stage
    translation_residual: jnp.ndarray  # |A t - b| of the recovery LS
    certificate: Any = None  # rotation_sync.CertificateResult when requested


def _transposed_rotation_data(src, dst, Mij, kappa=None):
    """g2o-convention measurements -> chordal model in transposed variables."""
    return rs.RotationSyncData(src=dst, dst=src,
                               Rij=jnp.swapaxes(Mij, -1, -2), kappa=kappa)


def solve_rotations_g2o(src, dst, Mij, n: int, kappa=None,
                        params: Optional[tnt.TNTParams] = None,
                        key=None) -> tuple:
    """Rotation stage for g2o-convention measurements M_e ~= R_i' R_j.

    Returns ``(R, tnt_result)`` with R of shape (n, d, d).
    """
    d = Mij.shape[-1]
    data = _transposed_rotation_data(src, dst, Mij, kappa)
    Q0 = rs.spectral_init(data, n, d, key=key).astype(Mij.dtype)
    if params is None:
        f32 = Mij.dtype == jnp.float32
        params = tnt.TNTParams(
            max_iterations=100,
            gradient_tolerance=(2e-3 if f32 else 1e-8),
            relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
            preconditioned_gradient_tolerance=0.0)
    res = tnt.solve(rs.make_problem(), Q0, params, data=data)
    return jnp.swapaxes(res.x, -1, -2), res


def recover_translations(R, src, dst, tij, weights=None, *, anchor: int = 0,
                         max_iterations: int = 2000, btol: float = 1e-8,
                         Atol: float = 1e-8):
    """Translation recovery: min_t sum_e w_e |t_j - t_i - R_i t_e|^2.

    Solved matrix-free by LSQR over the weighted incidence operator (one
    gather/scatter pair per product — XLA-fused, no matrix is formed).  The
    global-translation gauge is fixed by re-anchoring t[anchor] = 0.
    Returns ``(t, residual_norm)``.
    """
    n = R.shape[0]
    dt = R.dtype
    w = (jnp.sqrt(weights).astype(dt)[:, None] if weights is not None
         else jnp.ones((src.shape[0], 1), dt))

    # b_e = R_i t_e rotated into the world frame, weighted
    b = w * jnp.einsum("eij,ej->ei", R[src], tij.astype(dt),
                       precision=jax.lax.Precision.HIGHEST)

    def A(t):
        return w * (t[dst] - t[src])

    def At(r):
        rw = w * r
        out = jnp.zeros((n, R.shape[-1]), dt)
        return out.at[dst].add(rw).at[src].add(-rw)

    inner = lambda u, v: jnp.sum(u * v)
    res = lsqr(A, At, b, inner, inner, max_iterations=max_iterations,
               btol=btol, Atol=Atol)
    t = res.x - res.x[anchor][None, :]
    r = A(t) - b
    return t, jnp.sqrt(jnp.sum(r * r))


def alignment_errors(R, t, R_true, t_true):
    """Errors after optimal world-gauge alignment.

    The pose-graph gauge is a global rigid motion acting on the *left*:
    R_i -> G R_i, t_i -> G t_i + c.  Returns ``(mean_rot_err, max_t_err)``
    with the chordal mean |G R_i - R_true_i|_F / sqrt(n) and the max
    translation deviation after the optimal (G, c).
    """
    n = R.shape[0]
    M = jnp.einsum("nij,nkj->ik", R_true, R,
                   precision=jax.lax.Precision.HIGHEST)  # sum R_true R'
    # polar factor restricted to SO(d)
    u, _, vt = jnp.linalg.svd(M)
    s = jnp.ones(M.shape[0]).at[-1].set(jnp.sign(jnp.linalg.det(u @ vt)))
    G = (u * s[None, :]) @ vt
    rot_err = jnp.sqrt(jnp.sum((jnp.einsum("ij,njk->nik", G, R)
                                - R_true) ** 2) / n)
    tG = jnp.einsum("ij,nj->ni", G, t)
    c = jnp.mean(t_true - tG, axis=0)
    t_err = jnp.max(jnp.abs(tG + c - t_true))
    return rot_err, t_err


def solve_pose_graph(graph, *, dtype=jnp.float32,
                     params: Optional[tnt.TNTParams] = None,
                     anchor: int = 0, key=None,
                     certify: bool = False) -> PoseSyncResult:
    """Full SE(d) pose synchronization of an ``io.g2o.PoseGraph``.

    With ``certify=True`` the rotation estimate is checked for *global*
    optimality via the SE-Sync dual certificate (``rotation_sync.certify``:
    smallest eigenvalue of S = L - Lambda via LOBPCG)."""
    src = jnp.asarray(graph.src)
    dst = jnp.asarray(graph.dst)
    Mij = jnp.asarray(graph.Rij, dtype)
    kappa = (jnp.asarray(graph.kappa, dtype)
             if graph.kappa is not None else None)

    R, rres = solve_rotations_g2o(src, dst, Mij, graph.n_vertices,
                                  kappa=kappa, params=params, key=key)
    t, tres = recover_translations(
        R, src, dst, jnp.asarray(graph.tij, dtype),
        weights=kappa, anchor=anchor)
    cert = None
    if certify:
        # Certify in the transposed (chordal-model) variables used by the
        # rotation stage, on the same measurement data.
        cert = rs.certify(jnp.swapaxes(R, -1, -2),
                          _transposed_rotation_data(src, dst, Mij, kappa))
    return PoseSyncResult(R=R, t=t, rotation_result=rres,
                          translation_residual=tres, certificate=cert)
