"""Single-synchronization Steihaug-Toint CG for flat tangent spaces.

The memory-bound specialization of :mod:`optimization_tpu.linalg.stpcg` for
the large-n regime (the BASELINE "TNT on a 10^6+-variable problem" north
star).  Same functional contract as the reference STPCG
(``LinearAlgebra/IterativeSolvers.h:166-426``): truncation target
|r_k| <= |r_0| min(kappa_fgr, |r_0|^theta), negative-curvature/overlong
boundary exit with the sigma steplength, kernel-of-H escape with descent
alignment, and the |s|/<s,p>/|p| trust-region recurrences — but restructured
so one iteration is ONE fused memory pass with ONE reduction group:

- **Chronopoulos-Gear recurrences**: q = Hp is carried as a vector
  recurrence (q' = -w + beta q, w = Hr), so kappa = <p,Hp> comes from the
  scalar identity  kappa_k = <w_k,r_k> - (beta_k/alpha_{k-1}) rv_k  and no
  dot needs to complete between forming p and using alpha.
- **Structured operator**: H v = A0(v) + U B (U' v) with A0 a cheap
  *elementwise* linear map (recomputed freely inside fusions, never
  materialized), U an (n, k) block of a few dense vectors, B a (k, k)
  symmetric coupling.  Every quantity the NEXT iteration needs —
  <w,r>, |w|^2 for the kernel check, <w,q> for the |q| recurrence — expands
  into plain dots over (r', A0 r', U, q') that accumulate in the SAME pass
  that writes the updated vectors.

Per iteration this moves ~(8+k)n words in one fusion group instead of the
generic engine's ~14n across several, and pays one reduction-sync instead
of two+.  Measured on TPU v5e at n=2^24: 2.0x faster per CG iteration than
the round-1 structure on the same operator.

The sphere Rayleigh-quotient Hessian fits the contract exactly via its
symmetrization  P H P = A0 + U B U'  with  A0 = 2A - rq I  (elementwise for
diagonal/generated A),  U = [x, 2Ax],  B = [[2 rq, -1], [-1, 0]]
(``models``/benchmarks build this via ``sphere_rayleigh_flat``).

Storage-dtype generic: vectors may be bf16; every dot accumulates in (at
least) f32 and every axpy casts back to the storage dtype.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .stpcg import STPCGResult

__all__ = ["FlatCGResult", "stpcg_flat", "sphere_rayleigh_flat"]


class FlatCGResult(NamedTuple):
    s: jnp.ndarray
    update_step_M_norm: jnp.ndarray
    num_iterations: jnp.ndarray
    # Predicted model decrease  -(<g,s> + 1/2 <s,Hs>)  tracked by scalar
    # recurrence (interior CG step: +1/2 alpha rv; boundary step along p:
    # -(sigma sign <r,p> + 1/2 sigma^2 kappa)) — algebraically identical to
    # the reference's explicit  dm = -<g,h> - 1/2 <h,Hh>  (TNT.h:511-521)
    # but free: TNT's gain ratio needs no extra Hessian application.
    predicted_decrease: jnp.ndarray


def _acc_dt(x):
    return jnp.promote_types(x.dtype, jnp.float32)


def _dot(a, b):
    dt = jnp.promote_types(_acc_dt(a), _acc_dt(b))
    return jnp.sum(a.astype(dt) * b.astype(dt))


class _State(NamedTuple):
    """Only THREE n-vectors are carried (s, r, p): q = Hp is recomputed
    elementwise inside the pass from p and the scalar recurrence
    U'p_k = -U'r_k + beta_k U'p_{k-1}, so the fused pass reads s/r/p/U and
    writes s/r/p — ~(6+k)n words per CG iteration."""

    k: jnp.ndarray
    s: jnp.ndarray
    r: jnp.ndarray
    p: jnp.ndarray            # p_{k-1}
    # reduction-group results (computed in pass k-1, over r_k and p_{k-1}):
    rv: jnp.ndarray           # <r_k, r_k>
    ar: jnp.ndarray           # <A0 r_k, r_k>
    nr: jnp.ndarray           # |A0 r_k|^2
    m: jnp.ndarray            # U' r_k               (k_lr,)
    mA: jnp.ndarray           # U' (A0 r_k)          (k_lr,)
    pa: jnp.ndarray           # <A0 r_k, A0 p_{k-1}>
    mB: jnp.ndarray           # U' (A0 p_{k-1})      (k_lr,)
    nAp: jnp.ndarray          # |A0 p_{k-1}|^2
    mp: jnp.ndarray           # U' p_{k-1}           (k_lr,) scalar recurrence
    # scalar recurrences:
    rv_prev: jnp.ndarray      # <r_{k-1}, r_{k-1}>
    alpha_prev: jnp.ndarray
    pr: jnp.ndarray           # <p_{k-1}, r_{k-1}>
    kappa_prev: jnp.ndarray
    s_p: jnp.ndarray          # <s_{k-1}, p_{k-1}>
    sk2: jnp.ndarray          # |s_k|^2
    pp_prev: jnp.ndarray      # |p_{k-1}|^2
    mval: jnp.ndarray         # model value <g,s_k> + 1/2 <s_k, H s_k>
    done: jnp.ndarray
    boundary: jnp.ndarray


def stpcg_flat(
    g: jnp.ndarray,
    A0: Callable[[jnp.ndarray], jnp.ndarray],
    U: Optional[jnp.ndarray],
    B: Optional[jnp.ndarray],
    Delta,
    *,
    max_iterations: int = 1000,
    kappa_fgr: float = 0.1,
    theta: float = 0.5,
    epsilon: float = 1e-8,
) -> STPCGResult:
    """Approximately solve  min <g,s> + 1/2 <s, Hs>  s.t. |s| <= Delta  for
    H = A0 + U B U', with STPCG truncation/boundary/kernel semantics.

    - ``A0``: elementwise (diagonal-like) linear operator; called on vectors
      several times per iteration and expected to fuse (never materialized
      across passes).
    - ``U``: (n, k) dense block, ``B``: (k, k) symmetric; pass None/None for
      a purely elementwise Hessian.
    - Euclidean metric, no preconditioner (the generic engine covers those).
    """
    n = g.shape[0]
    dtype = g.dtype
    sdt = _acc_dt(g)

    # U is a TUPLE of flat (n,) vectors — an (n, k) array would be padded
    # by the TPU tiler (trailing dim k -> 128 lanes), multiplying its
    # memory traffic ~64x (measured: it erased the whole engine win).
    # An entry may also be a NULLARY CALLABLE returning the vector: it is
    # then regenerated elementwise inside every fusion instead of being
    # stored and re-read from HBM (e.g. y = 2 A x for elementwise A).
    if U is None:
        U = ()
        B = jnp.zeros((0, 0), sdt)
    U = tuple((u if callable(u) else (lambda uu=u: uu)) for u in U)
    k_lr = len(U)
    B = jnp.asarray(B, sdt)

    Delta = jnp.asarray(Delta, sdt)
    Delta2 = Delta * Delta
    zero = jnp.zeros((), sdt)

    def Udots(v):
        """U' v accumulated in f32+: (k_lr,)."""
        if k_lr == 0:
            return jnp.zeros((0,), sdt)
        return jnp.stack([_dot(u(), v) for u in U])

    def H_of(v, mv):
        """H v given mv = U'v (elementwise + small-rank broadcast)."""
        out = A0(v).astype(sdt)
        if k_lr:
            c = B @ mv
            for j in range(k_lr):
                out = out + c[j] * U[j]().astype(sdt)
        return out

    # --- initialization: r0 = g, p_{-1} = 0, beta_0 = 0 ---
    r0 = g
    rv0 = _dot(r0, r0)
    A0r0 = A0(r0).astype(sdt)
    ar0 = _dot(A0r0, r0)
    nr0 = _dot(A0r0, A0r0)
    m0 = Udots(r0)
    mA0 = Udots(A0r0)

    r0_norm = jnp.sqrt(rv0)
    target = r0_norm * jnp.minimum(jnp.asarray(kappa_fgr, sdt),
                                   r0_norm ** theta)

    st0 = _State(
        k=jnp.zeros((), jnp.int32),
        s=jnp.zeros_like(g), r=r0,
        p=jnp.zeros_like(g),
        rv=rv0, ar=ar0, nr=nr0, m=m0, mA=mA0,
        pa=zero, mB=jnp.zeros((k_lr,), sdt), nAp=zero,
        mp=jnp.zeros((k_lr,), sdt),
        rv_prev=zero, alpha_prev=jnp.ones((), sdt),
        pr=zero, kappa_prev=jnp.ones((), sdt),
        s_p=zero, sk2=zero, pp_prev=zero, mval=zero,
        done=jnp.asarray(False), boundary=jnp.asarray(False),
    )

    eps2 = jnp.asarray(epsilon, sdt) ** 2
    UU = (jnp.stack([Udots(u()) for u in U]) if k_lr
          else jnp.zeros((0, 0), sdt))

    def cond(st: _State):
        return ((st.k < max_iterations) & ~st.done
                & (jnp.sqrt(st.rv) > target))

    def half(st: _State, pend, apply_s: bool):
        """One CG iteration of the x2-unrolled loop body.

        ``s`` is touched only in the applying half: the deferring half
        returns its step coefficient (on the p it just formed) as ``pend``,
        and the applying half folds ``pend * p_prev`` into its own s update
        — both vectors it reads anyway — so the deferring half's fused pass
        moves 5n words and the applying half 7n (avg 6n/iteration) instead
        of 7n each.  ``frozen`` gates everything so exits fire with
        identical semantics whichever half they land in (the while cond is
        only evaluated between pairs)."""
        frozen = (st.done | (st.k >= max_iterations)
                  | (jnp.sqrt(st.rv) <= target))

        first = st.rv_prev == 0
        beta = jnp.where(first, zero, st.rv / jnp.where(first, 1.0,
                                                        st.rv_prev))

        # <w_k, r_k> = <A0 r,r> + (U'r)' B (U'r);  kappa via Chronopoulos-
        # Gear:  kappa_k = <w_k,r_k> - (beta/alpha_{k-1}) rv_k
        Bm = B @ st.m
        wr = st.ar + st.m @ Bm
        kappa = wr - (beta / st.alpha_prev) * st.rv

        # |w_k|^2, <w_k, q_{k-1}>, |q_{k-1}|^2 from the carried dot group
        # (w = A0 r + U B U'r, q_{k-1} = A0 p_{k-1} + U B U'p_{k-1};
        # UU = U'U precomputed outside the loop)
        Bmp = B @ st.mp
        ww = st.nr + 2.0 * (st.mA @ Bm) + Bm @ (UU @ Bm)
        wq = st.pa + st.mA @ Bmp + Bm @ st.mB + Bm @ (UU @ Bmp)
        qq_prev = st.nAp + 2.0 * (st.mB @ Bmp) + Bmp @ (UU @ Bmp)
        # |q_k|^2 = |w|^2 - 2 beta <w, q_{k-1}> + beta^2 |q_{k-1}|^2
        qq_k = ww - 2.0 * beta * wq + beta * beta * qq_prev
        # |p_k|^2 = rv + beta^2 |p_{k-1}|^2
        pp_k = st.rv + beta * beta * st.pp_prev
        # <p_k, r_k> = -rv + beta (<p,r>_{k-1} + alpha_{k-1} kappa_{k-1})
        pr_k = -st.rv + beta * (st.pr + st.alpha_prev * st.kappa_prev)
        # <s_k, p_k> = beta (<s_{k-1},p_{k-1}> + alpha_{k-1}|p_{k-1}|^2)
        sp_k = beta * (st.s_p + st.alpha_prev * st.pp_prev)

        in_kernel = qq_k < eps2 * pp_k
        sign = jnp.where(in_kernel & (pr_k > 0), -jnp.ones((), sdt),
                         jnp.ones((), sdt))
        sp_eff = sign * sp_k
        disc = sp_eff * sp_eff + pp_k * (Delta2 - st.sk2)
        sigma = (-sp_eff + jnp.sqrt(jnp.maximum(disc, 0.0))) \
            / jnp.maximum(pp_k, jnp.finfo(sdt).tiny)

        alpha = st.rv / kappa
        sk2_next = st.sk2 + 2.0 * alpha * sp_k + alpha * alpha * pp_k
        boundary = (in_kernel | (kappa <= 0) | (sk2_next > Delta2)) & ~frozen

        cs = jnp.where(boundary, sigma * sign, alpha).astype(sdt)
        cs = jnp.where(frozen, zero, cs)
        cr = jnp.where(boundary | frozen, zero, alpha)

        # model value: interior CG step decreases it by alpha rv / 2; the
        # boundary step from s_k along sigma*sign*p_k adds
        # sigma sign <r_k,p_k> + 1/2 sigma^2 kappa_k  (all tracked scalars)
        m_int = st.mval - 0.5 * alpha * st.rv
        m_bnd = st.mval + sigma * sign * pr_k + 0.5 * sigma * sigma * kappa
        m_new = jnp.where(frozen, st.mval,
                          jnp.where(boundary, m_bnd, m_int))

        # U'p_k = -U'r_k + beta U'p_{k-1} (scalar recurrence): q_k is then
        # recomputed elementwise from p_k instead of being carried.
        mp_k = -st.m + beta * st.mp

        # --- THE pass: form p, recompute q = H p elementwise, update r
        # (and s in the applying half), accumulate the dot group ---
        p2 = (-st.r.astype(sdt) + beta * st.p.astype(sdt))
        q2 = H_of(p2, mp_k)
        r2 = (st.r.astype(sdt) + cr * q2).astype(dtype)
        if apply_s:
            s2 = (st.s.astype(sdt) + pend * st.p.astype(sdt)
                  + cs * p2).astype(dtype)
            pend_out = zero
        else:
            s2 = st.s
            pend_out = cs
        p2 = p2.astype(dtype)

        A0r2 = A0(r2).astype(sdt)
        A0p2 = A0(p2).astype(sdt)
        rv2 = _dot(r2, r2)
        ar2 = _dot(A0r2, r2)
        nr2 = _dot(A0r2, A0r2)
        m2 = Udots(r2)
        mA2 = Udots(A0r2)
        pa2 = _dot(A0r2, A0p2)
        mB2 = Udots(A0p2)
        nAp2 = _dot(A0p2, A0p2)

        exit_now = boundary | frozen

        return _State(
            k=jnp.where(exit_now, st.k, st.k + 1),
            s=s2,
            r=jnp.where(exit_now, st.r, r2),
            p=p2,
            rv=jnp.where(exit_now, st.rv, rv2),
            ar=ar2, nr=nr2, m=m2, mA=mA2,
            pa=pa2, mB=mB2, nAp=nAp2, mp=mp_k,
            rv_prev=jnp.where(exit_now, st.rv_prev, st.rv),
            alpha_prev=jnp.where(exit_now, st.alpha_prev, alpha),
            pr=jnp.where(exit_now, st.pr, pr_k),
            kappa_prev=jnp.where(exit_now, st.kappa_prev, kappa),
            s_p=jnp.where(exit_now, st.s_p, sp_k),
            sk2=jnp.where(exit_now, st.sk2, sk2_next),
            pp_prev=jnp.where(exit_now, st.pp_prev, pp_k),
            mval=m_new,
            done=st.done | boundary,
            boundary=jnp.where(frozen, st.boundary, boundary),
        ), pend_out

    def body(st: _State) -> _State:
        st1, pend = half(st, zero, apply_s=False)
        st2, _ = half(st1, pend, apply_s=True)
        return st2

    st = jax.lax.while_loop(cond, body, st0)

    update_step_M_norm = jnp.where(st.boundary, Delta, jnp.sqrt(st.sk2))
    return FlatCGResult(s=st.s, update_step_M_norm=update_step_M_norm,
                        num_iterations=st.k,
                        predicted_decrease=-st.mval)


def sphere_rayleigh_flat(x, A_elem, rq=None):
    """Flat-operator structure of the sphere Rayleigh-quotient Hessian.

    For f(x) = <x, A x> on S^{n-1} (A symmetric, applied elementwise by
    ``A_elem``), the symmetrized Riemannian Hessian  P H P  at unit x is

        A0 = 2A - rq I,   U = (x, 2Ax),   B = [[2 rq, -1], [-1, 0]],

    with rq = <x, 2Ax>.  On tangent vectors this equals the usual
    one-sided-projected Hessian  proj_x(2Av) - rq v  exactly; off the
    tangent space it is the symmetric extension CG needs.

    Returns ``(A0, U, B, rq)``.
    """
    y = 2.0 * A_elem(x)
    if rq is None:
        rq = _dot(x, y)

    def A0(v):
        return 2.0 * A_elem(v) - rq * v.astype(_acc_dt(v))

    # y is regenerated elementwise inside every CG fusion (2 A x reads only
    # x, which the pass reads anyway) instead of being stored in HBM.
    U = (x, lambda: (2.0 * A_elem(x)).astype(x.dtype))
    B = jnp.asarray([[2.0 * rq, -1.0], [-1.0, 0.0]], _acc_dt(x))
    return A0, U, B, rq
