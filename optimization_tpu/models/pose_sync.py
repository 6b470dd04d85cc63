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

from ..core.problem import RiemannianProblem
from ..linalg.lsqr import lsqr
from ..solvers import tnt
from . import rotation_sync as rs

__all__ = ["PoseSyncResult", "solve_pose_graph", "recover_translations",
           "marginalized_problem", "alignment_errors"]


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


def _weighted_laplacian_solver(src, dst, tau, n, *, max_iterations=400,
                               rtol=None):
    """Matrix-free CG solve of the weighted graph Laplacian L_tau z = r
    (L_tau = A' diag(tau) A with A the edge incidence operator), columnwise
    on (n, k) right-hand sides.  Consistent singular systems (columns of r
    sum to zero) stay in range(L_tau) when started at zero, so the minimum-
    norm solution comes out of plain CG.

    ``rtol`` defaults to ``50 * eps(dtype)`` — pushing f32 CG past its
    attainable residual makes the recurrences diverge (loss of orthogonality)
    and silently corrupts the marginalized objective, so the tolerance must
    track the dtype.  A curvature-breakdown guard stops the iteration when
    roundoff makes <p, L p> non-positive."""

    def L(z):
        dz = tau[:, None] * (z[dst] - z[src])
        out = jnp.zeros_like(z)
        return out.at[dst].add(dz).at[src].add(-dz)

    def solve(r):
        tol = (50.0 * jnp.finfo(r.dtype).eps if rtol is None else rtol)
        r0n = jnp.sqrt(jnp.sum(r * r))

        def body(c):
            k, z, res, p, rs, ok = c
            Lp = L(p)
            curv = jnp.sum(p * Lp)
            good = curv > 0
            alpha = jnp.where(good, rs / jnp.where(good, curv, 1.0), 0.0)
            z = z + alpha * p
            res = res - alpha * Lp
            rs_new = jnp.sum(res * res)
            p = res + (rs_new / rs) * p
            return (k + 1, z, res, p, rs_new, good)

        def cond(c):
            k, z, res, p, rs, ok = c
            return ok & (k < max_iterations) & (jnp.sqrt(rs) > tol * r0n)

        z0 = jnp.zeros_like(r)
        _, z, _, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), z0, r, r,
                         jnp.sum(r * r), jnp.asarray(True)))
        return z

    return solve


def marginalized_problem(src, dst, Mij, tij, kappa=None, tau=None,
                         *, cg_iterations=400):
    """The full SE-Sync rotation problem with translations marginalized out.

    The SE(d) cost  sum_e kappa_e |R_j - R_i M_e|^2 + tau_e |t_j - t_i -
    R_i t_e|^2  is quadratic in t for fixed R; plugging in the optimal
    translations leaves a quadratic form in the (transposed, stacked)
    rotations:

        f(X) = tr(X' L_conn X) + <B(X), W (I - P) W B(X)>,

    where B(X)_e = t_e' X_{i(e)} (the translation data contracted against the
    source block), W = diag(sqrt(tau)), and P is the orthogonal projector
    onto range(W A) applied through a matrix-free CG solve of the weighted
    graph Laplacian (A = incidence).  This is the single-stage SE-Sync
    objective; minimizing it couples rotations through the translation
    measurements instead of the two-stage rotation-then-translation pipeline.

    Returns ``(problem, Q_op, n)``: a :class:`RiemannianProblem` over
    SO(d)^n in the transposed variables Q_k = R_k' (solve it like
    rotation-sync, then transpose), and the symmetric PSD operator ``Q_op``
    on (n d, k) blocks (for certification via ``rotation_sync.certify``).
    """
    d = Mij.shape[-1]
    n = int(jnp.maximum(jnp.max(src), jnp.max(dst))) + 1
    dtype = Mij.dtype
    if tau is None:
        tau = jnp.ones_like(src, dtype=dtype)
    tau = tau.astype(dtype)
    sqw = jnp.sqrt(tau)

    rot_data = _transposed_rotation_data(src, dst, Mij, kappa)
    L_conn = rs.connection_laplacian_op(rot_data, n, d)
    lap_solve = _weighted_laplacian_solver(src, dst, tau, n,
                                           max_iterations=cg_iterations)

    tijd = tij.astype(dtype)

    def Bop(X):
        # (E, k): rows t_e' X_{src(e)}
        k = X.shape[-1]
        Xb = X.reshape(n, d, k)
        return jnp.einsum("ei,eik->ek", tijd, Xb[src],
                          precision=jax.lax.Precision.HIGHEST)

    def Bt(Y):
        # adjoint: block i accumulates sum_{e: src=i} t_e (x) Y_e
        k = Y.shape[-1]
        contrib = tijd[:, :, None] * Y[:, None, :]          # (E, d, k)
        out = jnp.zeros((n, d, k), Y.dtype)
        return out.at[src].add(contrib).reshape(n * d, k)

    def A_inc(z):
        return z[dst] - z[src]

    def At_inc(y):
        out = jnp.zeros((n, y.shape[-1]), y.dtype)
        return out.at[dst].add(y).at[src].add(-y)

    def proj_complement(Y):
        # (I - P) Y with P the projector onto range(W A), per column
        rhs = At_inc(sqw[:, None] * Y)
        z = lap_solve(rhs)
        return Y - sqw[:, None] * A_inc(z)

    def Q_tau(V):
        return Bt(sqw[:, None] * proj_complement(sqw[:, None] * Bop(V)))

    def Q_op(V):
        return L_conn(V) + Q_tau(V)

    def f(Qr, data):
        X = Qr.reshape(n * d, d)
        WB = sqw[:, None] * Bop(X)
        ft = jnp.sum(WB * proj_complement(WB))
        return jnp.trace(jnp.matmul(X.T, L_conn(X),
                                    precision=jax.lax.Precision.HIGHEST)) + ft

    # The generic autodiff Hessian cannot differentiate through the inner CG
    # while_loop, so the Riemannian Hessian is analytic.  For f = tr(X'QX)
    # on a product of rotations (projection proj_X(V) = V - X sym(X'V)):
    #     Hess f(X)[V] = proj( 2 Q V - V sym(X_i' G_i) ),   G = 2 Q X,
    # with the Weingarten term inside the projection (verified numerically
    # against the dense autodiff Hessian in tests).
    def _sym(a):
        return 0.5 * (a + jnp.swapaxes(a, -1, -2))

    def _egrad(Qr):
        return (2.0 * Q_op(Qr.reshape(n * d, d))).reshape(n, d, d)

    def grad(Qr, data):
        return rs.ROTATIONS.proj(Qr, _egrad(Qr))

    def quadratic_model(Qr, data):
        G = _egrad(Qr)
        g = rs.ROTATIONS.proj(Qr, G)
        S = _sym(jnp.einsum("nij,nik->njk", Qr, G,
                            precision=jax.lax.Precision.HIGHEST))

        def hvp(V):
            GV = _egrad(V)
            corr = jnp.einsum("nij,njk->nik", V, S,
                              precision=jax.lax.Precision.HIGHEST)
            return rs.ROTATIONS.proj(Qr, GV - corr)

        return g, hvp

    def hess_vec(Qr, V, data):
        _, hvp = quadratic_model(Qr, data)
        return hvp(V)

    problem = RiemannianProblem(f=f, manifold=rs.ROTATIONS, grad=grad,
                                hess_vec=hess_vec,
                                quadratic_model=quadratic_model)
    return problem, Q_op, n


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
                     certify: bool = False,
                     marginalized: bool = False,
                     tau=None) -> PoseSyncResult:
    """Full SE(d) pose synchronization of an ``io.g2o.PoseGraph``.

    With ``certify=True`` the rotation estimate is checked for *global*
    optimality via the SE-Sync dual certificate (``rotation_sync.certify``:
    smallest eigenvalue of S = Q - Lambda via LOBPCG).

    With ``marginalized=True`` the rotation stage minimizes the full SE-Sync
    objective with translations marginalized out (:func:`marginalized_
    problem`) instead of the rotation-only chordal cost — the translation
    measurements then inform the rotations.  ``tau`` supplies per-edge
    translational weights (defaults to 1)."""
    src = jnp.asarray(graph.src)
    dst = jnp.asarray(graph.dst)
    Mij = jnp.asarray(graph.Rij, dtype)
    tij = jnp.asarray(graph.tij, dtype)
    kappa = (jnp.asarray(graph.kappa, dtype)
             if graph.kappa is not None else None)

    if marginalized:
        problem, Q_op, n = marginalized_problem(src, dst, Mij, tij,
                                                kappa=kappa, tau=tau)
        rot_data = _transposed_rotation_data(src, dst, Mij, kappa)
        Q0 = rs.spectral_init(rot_data, n, Mij.shape[-1],
                              key=key).astype(dtype)
        if params is None:
            f32 = dtype == jnp.float32
            params = tnt.TNTParams(
                max_iterations=100,
                gradient_tolerance=(2e-3 if f32 else 1e-8),
                relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
                preconditioned_gradient_tolerance=0.0)
        rres = tnt.solve(problem, Q0, params)
        R = jnp.swapaxes(rres.x, -1, -2)
        cert_op = Q_op
        cert_x = rres.x
    else:
        R, rres = solve_rotations_g2o(src, dst, Mij, graph.n_vertices,
                                      kappa=kappa, params=params, key=key)
        cert_op = None
        cert_x = jnp.swapaxes(R, -1, -2)

    t, tres = recover_translations(R, src, dst, tij,
                                   weights=tau, anchor=anchor)
    cert = None
    if certify:
        # Certify in the transposed (chordal-model) variables on the same
        # objective the rotation stage minimized (L for the chordal model,
        # the full marginalized Q when marginalized=True).
        cert = rs.certify(cert_x,
                          _transposed_rotation_data(src, dst, Mij, kappa),
                          operator=cert_op)
    return PoseSyncResult(R=R, t=t, rotation_result=rres,
                          translation_residual=tres, certificate=cert)
