"""LOBPCG block eigensolver (Duersch-Shao-Yang-Gu robust variant).

Computes the ``nev`` algebraically-smallest eigenpairs of the symmetric
generalized problem  A x = lambda B x  (B SPD), following the same algorithm
as the reference ``LOBPCG`` (``LinearAlgebra/LOBPCG.h:131-337``):
Rayleigh-Ritz on the three-block subspace S = [X | W | P] with diagonal
equilibration, soft locking of the contiguous converged prefix, randomized
2-norm estimates of A and B, and the scale-invariant convergence test

    r_i <= tau * (|A|_est + theta_i |B|_est) * |x_i|         (LOBPCG.h:292-307)

**TPU-native redesign — static-shape soft locking.**  XLA requires static
shapes, so instead of shrinking the basis (reference ``LOBPCG.h:249-264``
keeps ``ns = 3 nx - 2 nc`` live columns), S is always (m, 3 nx) and locked
W/P columns are *zeroed*; the Gram pencil is then repaired by writing 1
(resp. a moderate *negative* sentinel) into the masked diagonal of S'BS
(resp. S'AS).  The pencil decouples exactly into the active block plus
trivial fake eigenpairs that sort first; the active Ritz pairs are read from
the static-width window starting at the known fake count, so they are
*bitwise the mathematics of the reference's shrunken basis*.  (Sentinels are
kept near the active spectrum's scale: TPU's QDWH-based eigh normalizes by
the matrix norm, so 1/eps-scale sentinels erase f32 accuracy.)  All heavy
math is three
(m x 3nx) block operator applications and (3nx x m)@(m x 3nx) Gram GEMMs —
exactly the MXU-shaped kernels a TPU wants; the small (3nx)^2 eigensolve runs
as a single fused ``eigh``.

Efficiency deviation (documented): the reference recomputes ``AX = A(X)``
after the Rayleigh-Ritz step (``LOBPCG.h:281-282``); we form ``AX = AS @ C_x``
(algebraically identical) to save one block operator application per
iteration.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LOBPCGResult", "lobpcg", "rayleigh_ritz"]


def _mm(a, b):
    """Full-precision matmul: the TPU MXU's default bf16 inputs destroy the
    Gram pencil / Ritz rotations in f32 (verified on hardware), so every
    precision-critical GEMM in this module pins HIGHEST precision."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def rayleigh_ritz(A: jnp.ndarray, B: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Robust Rayleigh-Ritz for the dense symmetric pencil (A, B), B PSD.

    Returns ``(Theta, C)`` with ``C' A C = diag(Theta)`` and ``C' B C = I``
    on the numerically independent subspace, eigenvalues ascending.

    Equilibrates B by its diagonal first (reference ``LOBPCG.h:53-62``), then
    — instead of the reference's Cholesky route, which collapses in f32 when
    the LOBPCG basis grows near-collinear — whitens through the
    eigendecomposition of B with **spectral filtering** (the SVQB-style
    robustness of Duersch-Shao-Yang-Gu): directions of B_eq with relative
    eigenvalue below k*eps are deflated (their C columns are exactly zero and
    their Ritz values are a large sentinel, so they sort last and are never
    selected).  In f64 on a well-conditioned pencil this is algebraically the
    reference computation.
    """
    # The matmul-precision scope also covers the QDWH/Jacobi matmuls inside
    # XLA's eigh lowering — at the TPU default (bf16 MXU inputs) the Ritz
    # rotations come back too inaccurate to converge (verified on hardware).
    with jax.default_matmul_precision("float32"):
        n = B.shape[0]
        eps = jnp.finfo(B.dtype).eps
        bdiag = jnp.diagonal(B)
        d = 1.0 / jnp.sqrt(jnp.maximum(bdiag, eps * jnp.max(bdiag)))
        A_eq = A * d[:, None] * d[None, :]
        B_eq = B * d[:, None] * d[None, :]
        B_eq = 0.5 * (B_eq + B_eq.T)

        w, Q = jnp.linalg.eigh(B_eq)
        good = w > (n * eps) * jnp.max(w)
        inv_sqrt_w = jnp.where(good,
                               1.0 / jnp.sqrt(jnp.where(good, w, 1.0)), 0.0)
        W_half = Q * inv_sqrt_w[None, :]      # whitening: W' B_eq W = I_good
        At = _mm(_mm(W_half.T, A_eq), W_half)
        At = 0.5 * (At + At.T)
        # Deflated rows/cols of At are exactly zero; a sentinel diagonal
        # decouples them and sorts their fake eigenvalues last.  The sentinel
        # must stay within a few orders of the active spectrum: TPU's eigh
        # (QDWH-based) normalizes by |At|, so a 1/eps-scale sentinel pushes
        # the active eigenvalues below f32 resolution (verified on hardware).
        big = 16.0 * jnp.max(jnp.abs(At)) + 1.0
        At = At + jnp.diag(jnp.where(good, 0.0, big).astype(B.dtype))
        theta, U = jnp.linalg.eigh(At)
        C = _mm(W_half, U)
        return theta, C * d[:, None]


class LOBPCGResult(NamedTuple):
    theta: jnp.ndarray            # (nev,) Ritz values
    X: jnp.ndarray                # (m, nev) Ritz vectors
    num_iterations: jnp.ndarray
    num_converged: jnp.ndarray
    residual_norms: jnp.ndarray   # (nev,) at exit


class _State(NamedTuple):
    k: jnp.ndarray
    X: jnp.ndarray
    AX: jnp.ndarray
    BX: jnp.ndarray
    R: jnp.ndarray
    P: jnp.ndarray
    theta: jnp.ndarray
    nc: jnp.ndarray
    r: jnp.ndarray
    done: jnp.ndarray


def lobpcg(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    B: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    T: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    *,
    X0: Optional[jnp.ndarray] = None,
    m: Optional[int] = None,
    nx: Optional[int] = None,
    nev: int,
    max_iterations: int = 100,
    tau: float = 1e-6,
    key: Optional[jax.Array] = None,
    user_function: Optional[Callable[..., jnp.ndarray]] = None,
) -> LOBPCGResult:
    """Smallest ``nev`` eigenpairs of ``A x = lambda B x``.

    - ``A(S)``: symmetric block operator on (m, k) matrices.
    - ``B``: optional SPD block operator (absent => standard eigenproblem).
    - ``T``: optional SPD preconditioner approximating A^{-1}.
    - ``X0``: (m, nx) initial block; if omitted, a random Gaussian block of
      shape (m, nx) is drawn (reference ``LOBPCG.h:376-390``).
    - ``tau``: scale-invariant convergence tolerance (``LOBPCG.h:121-126``).
    - ``user_function(k, nev, theta, X, r, nc) -> bool``: optional pure
      stopping predicate (analog of ``LOBPCGUserFunction``,
      ``LOBPCG.h:86-93,322-324``).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if X0 is None:
        if m is None or nx is None:
            raise ValueError("Either X0 or (m, nx) must be supplied")
        key, sub = jax.random.split(key)
        X0 = jax.random.normal(sub, (m, nx))
    m, nx = X0.shape
    if nev > nx:
        raise ValueError("Block size nx must be greater than or equal to "
                         "the number nev of desired eigenpairs")
    if nx > m:
        raise ValueError("Block size nx must be less than or equal to "
                         "the dimension m of the problem")

    dtype = X0.dtype
    Bop = B if B is not None else (lambda S: S)
    Top = T if T is not None else (lambda S: S)

    # Randomized 2-norm estimates (reference LOBPCG.h:199-214)
    omega = jax.random.normal(key, (m, nx), dtype)
    omega_norm = jnp.linalg.norm(omega)
    A2normest = jnp.linalg.norm(A(omega)) / omega_norm
    B2normest = (jnp.linalg.norm(Bop(omega)) / omega_norm
                 if B is not None else jnp.ones((), dtype))

    # Sentinel eigenvalue for masked (locked) basis columns: *below* every
    # possible Ritz value of the pencil (|theta| <= ~|A| for B ~ I), so fake
    # pairs sort first and the active window starts at the known fake count.
    # Kept within a few orders of the active spectrum — TPU's QDWH eigh
    # normalizes by |At|, so 1/eps-scale sentinels destroy f32 accuracy.
    neg_sent = -(16.0 * (A2normest + B2normest) + 1.0)

    # --- initialization: B-orthonormalize X0 (reference LOBPCG.h:218-230) ---
    AX = A(X0)
    BX = Bop(X0)
    theta0, C0 = rayleigh_ritz(_mm(X0.T, AX), _mm(X0.T, BX))
    X = _mm(X0, C0)
    AX = _mm(AX, C0)
    BX = _mm(BX, C0)
    R = AX - BX * theta0[None, :]

    st0 = _State(
        k=jnp.zeros((), jnp.int32),
        X=X, AX=AX, BX=BX, R=R,
        P=jnp.zeros_like(X),
        theta=theta0,
        nc=jnp.zeros((), jnp.int32),
        r=jnp.linalg.norm(R[:, :nev], axis=0),
        done=jnp.asarray(False),
    )

    col = jnp.arange(nx)
    col_s = jnp.arange(3 * nx)

    def body(st: _State) -> _State:
        k = st.k + 1

        # Preconditioned search directions (reference LOBPCG.h:247)
        W = Top(st.R)

        # Soft locking masks: only the *active* (non-converged) trailing
        # columns of W and P enter the search space (reference LOBPCG.h:249-264)
        w_mask = col >= st.nc
        p_mask = w_mask & (k > 1)
        S = jnp.concatenate(
            [st.X, W * w_mask[None, :], st.P * p_mask[None, :]], axis=1)

        AS = A(S)
        BS = Bop(S)

        StAS = _mm(S.T, AS)
        StBS = _mm(S.T, BS)

        # Repair the pencil on masked columns: unit B-diagonal, negative
        # sentinel A-diagonal => exact decoupling; the fake eigenpairs sort
        # *first*, so the active Ritz pairs occupy the static-width window
        # starting at the (known) fake count.
        mask_s = jnp.concatenate(
            [jnp.ones((nx,), bool), w_mask, p_mask]).astype(dtype)
        off = 1.0 - mask_s
        StAS = (StAS * mask_s[:, None] * mask_s[None, :]
                + jnp.diag(neg_sent * off))
        StBS = StBS * mask_s[:, None] * mask_s[None, :] + jnp.diag(off)

        theta_all, C = rayleigh_ritz(StAS, StBS)
        n_fake = (3 * nx - jnp.sum(mask_s)).astype(jnp.int32)
        theta = jax.lax.dynamic_slice(theta_all, (n_fake,), (nx,))
        C_x = jax.lax.dynamic_slice(C, (jnp.zeros((), jnp.int32), n_fake),
                                    (3 * nx, nx))

        X_new = _mm(S, C_x)
        AX_new = _mm(AS, C_x)
        BX_new = _mm(BS, C_x)
        R_new = AX_new - BX_new * theta[None, :]
        # Implicit-difference block P (reference LOBPCG.h:288)
        P_new = _mm(S[:, nx:], C_x[nx:, :])

        # Convergence test (reference LOBPCG.h:292-318)
        r = jnp.linalg.norm(R_new[:, :nev], axis=0)
        x_norms = jnp.linalg.norm(X_new[:, :nev], axis=0)
        tolerances = tau * (A2normest
                            + B2normest * jnp.abs(theta[:nev])) * x_norms
        converged = r <= tolerances
        # Contiguous converged prefix (soft locking must respect order)
        nc = jnp.sum(jnp.cumprod(converged.astype(jnp.int32))).astype(jnp.int32)

        done = nc >= nev
        if user_function is not None:
            done = done | jnp.asarray(
                user_function(k, nev, theta, X_new, r, nc))

        return _State(k=k, X=X_new, AX=AX_new, BX=BX_new, R=R_new, P=P_new,
                      theta=theta, nc=nc, r=r, done=done)

    def cond(st: _State):
        return (st.k < max_iterations) & ~st.done

    st = jax.lax.while_loop(cond, body, st0)

    return LOBPCGResult(
        theta=st.theta[:nev],
        X=st.X[:, :nev],
        num_iterations=st.k,
        num_converged=st.nc,
        residual_norms=st.r,
    )
