"""LSQR: Golub-Kahan bidiagonalization least squares with trust region.

Approximately solves

    min_x |A x - b|^2 + lambda |x|^2    s.t.  |x| <= Delta

as one jitted ``lax.while_loop``: each iteration costs exactly one ``A`` and
one ``A^T`` application (Jacobian-vector / vector-Jacobian products when
driven by TNLS) plus scalar plane-rotation recurrences.

Functional contract matches the reference ``LSQR``
(``LinearAlgebra/IterativeSolvers.h:552-875``), including:

- the damping plane rotation eliminating sqrt(lambda) and the bidiagonal
  rotation (``IterativeSolvers.h:726-747``);
- incremental estimates |Abar|, cond(Abar) = |Abar| |D|_F, |rbar|,
  |Abar' rbar| (``IterativeSolvers.h:753-818``);
- trust-region steplength clipping so x terminates *on* the boundary
  (``IterativeSolvers.h:777-794``);
- stopping tests S1 (residual), S2 (gradient), S3 (conditioning),
  S4 (trust region) (``IterativeSolvers.h:824-841``).

Deviation (documented): ``num_iterations`` counts *completed* iterations
(the reference's loop-index bookkeeping undercounts by one when a stopping
test fires).

Vectors are arbitrary PyTrees; the domain/codomain inner products are
injectable (they become ``psum`` collectives when sharded).
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.tree import tree_axpy, tree_scale, tree_where, tree_zeros_like

__all__ = ["LSQRResult", "lsqr"]


class LSQRResult(NamedTuple):
    x: Any
    xnorm: jnp.ndarray
    num_iterations: jnp.ndarray
    # |b - A x|^2 at the returned x, tracked by scalar recurrence (exact in
    # exact arithmetic, including through the trust-region boundary clip) —
    # lets TNLS form its model decrease dq = |F|^2 - |J h + F|^2 without a
    # second Jacobian application (reference TNLS.h:565-572 applies gradFx
    # to h explicitly; the recurrence removes that subgraph entirely, the
    # same move as STPCG's predicted_decrease recurrence).
    rsq: jnp.ndarray = jnp.nan


class _State(NamedTuple):
    k: jnp.ndarray
    x: Any
    u: Any
    v: Any
    w: Any
    alpha: jnp.ndarray
    beta: jnp.ndarray
    rhobar: jnp.ndarray
    phibar: jnp.ndarray
    cs2: jnp.ndarray
    sn2: jnp.ndarray
    z: jnp.ndarray
    res2: jnp.ndarray
    Abar_norm_est: jnp.ndarray
    D_Fnorm2: jnp.ndarray
    xnorm: jnp.ndarray
    xxnorm: jnp.ndarray
    rbar_norm: jnp.ndarray
    Abar_rbar_norm: jnp.ndarray
    rsq: jnp.ndarray
    stop: jnp.ndarray


def _validate(lam, btol, Atol, cond_limit) -> None:
    if lam < 0:
        raise ValueError("Tikhonov regularization parameter (lambda) must be "
                         "a nonnegative real value")
    if btol < 0:
        raise ValueError("Stopping tolerance btol must be a nonnegative real number")
    if Atol < 0:
        raise ValueError("Stopping tolerance Atol must be a nonnegative real number")
    if cond_limit <= 0:
        raise ValueError(
            "Stopping tolerance Abar_cond_limit must be a positive real number")


def lsqr(
    A: Callable[[Any], Any],
    At: Callable[[Any], Any],
    b: Any,
    inner_x: Callable[[Any, Any], jnp.ndarray],
    inner_y: Optional[Callable[[Any, Any], jnp.ndarray]] = None,
    *,
    max_iterations: int = 1000,
    lam: float = 0.0,
    btol: float = 1e-6,
    Atol: float = 1e-6,
    cond_limit: float = 1e8,
    Delta=None,
    user_function: Optional[Callable[..., jnp.ndarray]] = None,
) -> LSQRResult:
    """Run LSQR.  ``Delta``, ``btol``, ``Atol`` may be traced scalars.

    ``user_function(k, x, xnorm, rbar_norm, Abar_rbar_norm, Abar_norm_est,
    Abar_cond_est) -> bool`` is an optional pure stopping predicate evaluated
    at the end of each iteration (jittable analog of ``LSQRUserFunction``,
    reference ``IterativeSolvers.h:450-456,843-851``).

    ``inner_y`` defaults to ``inner_x`` (the reference's square-type sugar
    overload, ``IterativeSolvers.h:859-875``).
    """
    if inner_y is None:
        inner_y = inner_x
    # Validate only static (python-scalar) arguments; TNLS passes traced
    # tolerances (its forcing term) which are checked at construction time.
    _validate(lam if isinstance(lam, (int, float)) else 0.0,
              btol if isinstance(btol, (int, float)) else 0.0,
              Atol if isinstance(Atol, (int, float)) else 0.0,
              cond_limit)

    def safe_div(t, s):
        denom = jnp.where(s > 0, s, 1.0)
        return tree_scale(1.0 / denom, t)

    # --- initialization (reference IterativeSolvers.h:588-692) ---
    u0 = b
    v0 = At(u0)
    alpha0 = jnp.sqrt(inner_x(v0, v0))
    beta0 = jnp.sqrt(inner_y(u0, u0))
    dtype = alpha0.dtype
    lam = jnp.asarray(lam, dtype)
    sqrt_lam = jnp.sqrt(lam)
    if Delta is None:
        # NB: XLA's sqrt overflows to NaN at finfo.max; compute on host.
        Delta = float(math.sqrt(float(jnp.finfo(dtype).max)))
    Delta = jnp.asarray(Delta, dtype)

    u0 = safe_div(u0, beta0)
    has_alpha = alpha0 > 0
    v0 = tree_where(has_alpha, safe_div(v0, alpha0), v0)
    # The initial alpha was computed from the *unnormalized* u = b, so it is a
    # factor of beta too large (reference IterativeSolvers.h:656-664)
    alpha0 = jnp.where(has_alpha & (beta0 > 0), alpha0 / beta0, alpha0)
    w0 = v0

    Abar_rbar0 = alpha0 * beta0
    bnorm = beta0
    zero = jnp.zeros((), dtype)

    st0 = _State(
        k=jnp.zeros((), jnp.int32),
        x=tree_zeros_like(v0), u=u0, v=v0, w=w0,
        alpha=alpha0, beta=beta0,
        rhobar=alpha0, phibar=beta0,
        cs2=-jnp.ones((), dtype), sn2=zero, z=zero, res2=zero,
        Abar_norm_est=zero, D_Fnorm2=zero,
        xnorm=zero, xxnorm=zero,
        rbar_norm=beta0, Abar_rbar_norm=Abar_rbar0,
        rsq=beta0 * beta0,  # x = 0: |b - A x|^2 = |b|^2
        # b is already a least-squares solution (A'b = 0): return immediately
        stop=(Abar_rbar0 == 0),
    )

    def cond(st: _State):
        return (st.k < max_iterations) & ~st.stop

    def body(st: _State) -> _State:
        # --- bidiagonalization step (reference IterativeSolvers.h:706-724) ---
        u_t = tree_axpy(-st.alpha, st.u, A(st.v))
        beta = jnp.sqrt(inner_y(u_t, u_t))
        beta_pos = beta > 0
        u_new = safe_div(u_t, beta)
        Abar_norm = jnp.where(
            beta_pos,
            jnp.sqrt(st.Abar_norm_est**2 + st.alpha**2 + beta**2 + lam),
            st.Abar_norm_est)
        v_t = tree_axpy(-beta, st.v, At(u_new))
        alpha_t = jnp.sqrt(inner_x(v_t, v_t))
        v_cand = tree_where(alpha_t > 0, safe_div(v_t, alpha_t), v_t)
        v_new = tree_where(beta_pos, v_cand, st.v)
        alpha = jnp.where(beta_pos, alpha_t, st.alpha)
        u_new = tree_where(beta_pos, u_new, u_t)

        # --- rotation eliminating the damping parameter ---
        rhobar1 = jnp.sqrt(st.rhobar**2 + lam)
        cs1 = st.rhobar / rhobar1
        sn1 = sqrt_lam / rhobar1
        psi = sn1 * st.phibar
        phibar = cs1 * st.phibar

        # --- rotation eliminating the subdiagonal element beta ---
        rho = jnp.sqrt(rhobar1**2 + beta**2)
        cs = rhobar1 / rho
        sn = beta / rho
        theta = sn * alpha
        rhobar = -cs * alpha
        phi = cs * phibar
        phibar = sn * phibar
        tau = sn * phi

        # --- right rotation for the |x| estimate ---
        delta = st.sn2 * rho
        gammabar = -st.cs2 * rho
        rhs = phi - delta * st.z
        zbar = rhs / gammabar
        gamma = jnp.sqrt(gammabar**2 + theta**2)
        cs2 = gammabar / gamma
        sn2 = theta / gamma
        z = rhs / gamma

        # --- x / w update with trust-region clipping ---
        wk2 = inner_x(st.w, st.w)
        dk2 = wk2 / (rho * rho)
        xnorm_full = jnp.sqrt(st.xxnorm + zbar**2)
        xxnorm = st.xxnorm + z * z
        t2 = -theta / rho

        def full_step(_):
            return phi / rho, xnorm_full

        def boundary_step(_):
            # Clip to land exactly on the trust-region boundary
            # (reference IterativeSolvers.h:777-794)
            xtx = inner_x(st.x, st.x)
            wtx = inner_x(st.w, st.x)
            disc = wtx * wtx + wk2 * (Delta * Delta - xtx)
            t1 = (-wtx + jnp.sqrt(jnp.maximum(disc, 0.0))) / wk2
            return t1, Delta

        t1, xnorm = jax.lax.cond(xnorm_full <= Delta, full_step,
                                 boundary_step, None)

        x_new = tree_axpy(t1, st.w, st.x)
        w_new = tree_axpy(t2, st.w, v_new)

        # --- norm / conditioning / residual estimates ---
        D_Fnorm2 = st.D_Fnorm2 + dk2
        Abar_cond = Abar_norm * jnp.sqrt(D_Fnorm2)
        res2 = st.res2 + psi * psi
        rbar_norm = jnp.sqrt(phibar * phibar + res2)
        Abar_rbar_norm = alpha * jnp.abs(tau)

        # Undamped residual |b - A x_new|^2 by recurrence.  The augmented
        # residual along the search direction is the quadratic
        #   |rbar(x + t w)|^2 = phibar^2 + res2 + (t rho - phi)^2
        # because (i) the full step t = phi/rho is its line minimizer (the
        # Krylov-space minimizer x_k lies on this line) and (ii)
        # |Abar w|^2 = rho^2 exactly (Abar D_k = U~ Qbar^T [I;0] has
        # orthonormal columns, so |Abar d_k| = 1 with d_k = w_k / rho).
        # Subtracting the damping term lam |x_new|^2 recovers |b - A x|^2 —
        # exact through the trust-region clip, where |x_new| = Delta by
        # construction of t1 (this is the boundary case the reference's
        # explicit gradFx(x,h) product exists to cover, TNLS.h:565-572).
        clip = t1 * rho - phi
        rsq = jnp.maximum(
            phibar * phibar + res2 + clip * clip - lam * xnorm * xnorm, 0.0)

        # --- stopping tests S1-S4 (reference IterativeSolvers.h:824-841) ---
        s1 = rbar_norm <= btol * bnorm + Atol * Abar_norm * xnorm
        s2 = Abar_rbar_norm <= Atol * Abar_norm * rbar_norm
        s3 = Abar_cond >= cond_limit
        s4 = xnorm >= Delta
        stop = s1 | s2 | s3 | s4
        if user_function is not None:
            stop = stop | jnp.asarray(user_function(
                st.k, x_new, xnorm, rbar_norm, Abar_rbar_norm, Abar_norm,
                Abar_cond))

        return _State(
            k=st.k + 1,
            x=x_new, u=u_new, v=v_new, w=w_new,
            alpha=alpha, beta=beta,
            rhobar=rhobar, phibar=phibar,
            cs2=cs2, sn2=sn2, z=z, res2=res2,
            Abar_norm_est=Abar_norm, D_Fnorm2=D_Fnorm2,
            xnorm=xnorm, xxnorm=xxnorm,
            rbar_norm=rbar_norm, Abar_rbar_norm=Abar_rbar_norm,
            rsq=rsq,
            stop=stop,
        )

    st = jax.lax.while_loop(cond, body, st0)
    return LSQRResult(x=st.x, xnorm=st.xnorm, num_iterations=st.k,
                      rsq=st.rsq)
