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
W/P columns are *zeroed*; the Gram pencil is then repaired by writing 1 (resp.
a large sentinel value) into the masked diagonal of S'BS (resp. S'AS).  The
pencil decouples exactly into the active block plus trivial fake eigenpairs
whose eigenvalues sort last, so the leading ``nx`` Ritz pairs are *bitwise the
mathematics of the reference's shrunken basis*.  All heavy math is three
(m x 3nx) block operator applications and (3nx x m)@(m x 3nx) Gram GEMMs —
exactly the MXU-shaped kernels a TPU wants; the small (3nx)^2 eigensolve runs
as a single fused ``eigh``.

Efficiency deviation (documented): the reference recomputes ``AX = A(X)``
after the Rayleigh-Ritz step (``LOBPCG.h:281-282``); we form ``AX = AS @ C_x``
(algebraically identical) to save one block operator application per
iteration.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LOBPCGResult", "lobpcg", "rayleigh_ritz"]


def rayleigh_ritz(A: jnp.ndarray, B: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rayleigh-Ritz for the dense symmetric pencil (A, B), B SPD.

    Returns ``(Theta, C)`` with ``C' A C = diag(Theta)`` and ``C' B C = I``,
    eigenvalues ascending.  Equilibrates B by its diagonal first (reference
    ``LOBPCG.h:53-62``), then reduces to a standard symmetric problem via
    Cholesky (the same LLT route Eigen's generalized solver uses).
    """
    d = 1.0 / jnp.sqrt(jnp.diagonal(B))
    A_eq = A * d[:, None] * d[None, :]
    B_eq = B * d[:, None] * d[None, :]
    # Tiny relative ridge (diag(B_eq) == 1 after equilibration): keeps the
    # Cholesky factorization alive when the search basis grows near-collinear
    # in low precision; O(eps) perturbation, invisible in f64.
    n = B.shape[0]
    ridge = 10.0 * n * jnp.finfo(B.dtype).eps
    B_eq = B_eq + ridge * jnp.eye(n, dtype=B.dtype)
    L = jnp.linalg.cholesky(B_eq)
    Z = jax.scipy.linalg.solve_triangular(L, A_eq, lower=True)
    Y = jax.scipy.linalg.solve_triangular(L, Z.T, lower=True)
    Y = 0.5 * (Y + Y.T)
    theta, U = jnp.linalg.eigh(Y)
    C = jax.scipy.linalg.solve_triangular(L.T, U, lower=False)
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

    # Sentinel eigenvalue for masked (locked) basis columns: large enough to
    # sort after every active Ritz value, small enough not to overflow.
    big = (A2normest + B2normest) / jnp.sqrt(jnp.finfo(dtype).eps)

    # --- initialization: B-orthonormalize X0 (reference LOBPCG.h:218-230) ---
    AX = A(X0)
    BX = Bop(X0)
    theta0, C0 = rayleigh_ritz(X0.T @ AX, X0.T @ BX)
    X = X0 @ C0
    AX = AX @ C0
    BX = BX @ C0
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

        StAS = S.T @ AS
        StBS = S.T @ BS

        # Repair the pencil on masked columns: unit B-diagonal, sentinel
        # A-diagonal => exact decoupling, fake eigenpairs sort last.
        mask_s = jnp.concatenate(
            [jnp.ones((nx,), bool), w_mask, p_mask]).astype(dtype)
        off = 1.0 - mask_s
        StAS = StAS * mask_s[:, None] * mask_s[None, :] + jnp.diag(big * off)
        StBS = StBS * mask_s[:, None] * mask_s[None, :] + jnp.diag(off)

        theta_all, C = rayleigh_ritz(StAS, StBS)
        theta = theta_all[:nx]
        C_x = C[:, :nx]

        X_new = S @ C_x
        AX_new = AS @ C_x
        BX_new = BS @ C_x
        R_new = AX_new - BX_new * theta[None, :]
        # Implicit-difference block P (reference LOBPCG.h:288)
        P_new = S[:, nx:] @ C_x[nx:, :]

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
