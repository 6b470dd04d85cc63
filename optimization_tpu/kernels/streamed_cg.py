"""Whole-loop Pallas kernel for the streamed (> VMEM) flat-CG regime.

The round-3 residency discovery (``linalg/flat_cg.resolve_body``) showed
XLA keeps a while-loop's state VMEM-resident only when ALL of it fits
(~128 MiB); past that boundary everything streams from HBM, including the
loop-invariant sphere point x — ~7n words per CG iteration for the
single body, sustained at ~0.62-0.73 of spec HBM by XLA's multi-stream
loop fusion (BENCH_r03).  This kernel closes both gaps at once
(VERDICT round 3, item 1):

- **Partial residency by hand**: the U base vector x (64 MiB at f32
  n=2^24) is DMA'd into VMEM ONCE per subproblem and stays pinned across
  all CG iterations, removing its per-iteration HBM stream entirely;
  s/r/p stream chunk-wise with double-buffered DMA — 6n words/iteration
  instead of 7n.
- **Envelope control**: the hand-scheduled DMA pipeline sustains 0.80 of
  spec HBM at this stream pattern (measured,
  ``benchmarks/probe_pallas_stream.py``: 659-660 GB/s real on v5e for
  both the 4- and 6-word bodies) where the XLA loop bodies measure
  ~510-600 GB/s of real bytes.

Semantics: exactly the single-iteration body of the pair engine
(``linalg/flat_cg._stpcg_flat_pair`` with ``body_kind="single"`` and the
kernel-of-H safeguard ON) — Chronopoulos-Gear kappa, the carried
reduction-group recurrences, boundary sigma-step with descent-aligned
kernel escape, truncation target |r_k| <= |r_0| min(kappa, |r_0|^theta)
— i.e. the reference STPCG contract
(``LinearAlgebra/IterativeSolvers.h:166-426``) for the structured
operator H = A0 + U B U'.  Parity is pinned by
``tests/test_streamed_cg.py`` (interpret mode) against both flat-CG
engines and the generic ``stpcg``.

Operator contract (chunk-aware — a Pallas kernel cannot apply the flat
engine's whole-vector closures to 1 MiB tiles):

- ``a0_chunk(i0, aux) -> (cr, 128)``: the DIAGONAL of the elementwise A0
  for rows [i0, i0+cr), regenerated in-kernel (never an HBM stream);
  ``aux`` is a tuple of traced scalars (e.g. the Rayleigh quotient).
- ``x``: the single stored U base vector, shape (n,) — pinned in VMEM.
- ``weights``: per-U-entry elementwise weight on x — ``None`` for the
  identity (u_j = x) or a chunk generator like ``a0_chunk`` (u_j = w ⊙ x,
  e.g. w = 2a for the sphere's u = 2Ax).
- ``B``: (k, k) symmetric coupling (traced).

The sphere Rayleigh-quotient Hessian P H P = A0 + U B U' with
A0 = 2A - rq I, U = (x, 2Ax), B = [[2rq, -1], [-1, 0]]
(``flat_cg.sphere_rayleigh_flat``) fits with one generator a(i0) for the
A diagonal: a0 = 2a - rq, weights = (None, 2a).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..linalg.flat_cg import FlatCGResult

__all__ = ["stpcg_flat_streamed", "sphere_rayleigh_streamed"]

LANES = 128
DEF_CHUNK_ROWS = 2048          # 1 MiB f32 per array chunk
PIN_X_BUDGET = 96 * 1024 * 1024   # pin x in VMEM while it fits this


def _pow(x, e):
    """x**e for a traced nonneg scalar and STATIC float e (Mosaic-safe:
    routed through a (1, 1) vector for the transcendentals)."""
    if e == 0.0:
        return jnp.ones((), x.dtype)
    if e == 0.5:
        return jnp.sqrt(x)
    if e == 1.0:
        return x
    v = jnp.exp(e * jnp.log(jnp.maximum(x, 1e-300).reshape(1, 1)))
    return v[0, 0]


def _kdot(a: Sequence, b: Sequence):
    tot = None
    for ai, bi in zip(a, b):
        t = ai * bi
        tot = t if tot is None else tot + t
    return tot if tot is not None else jnp.zeros((), jnp.float32)


def _matk(M: Sequence[Sequence], v: Sequence):
    """(k, k) scalar-matrix @ k-scalar-vector, Python-unrolled."""
    return [_kdot(row, v) for row in M]


def _mk_kernel(n_rows, cr, k_lr, a0_chunk, weights, max_iterations,
               kappa_fgr, theta, epsilon, n_aux, pair, sdt, pin_x,
               with_init=False, prec_chunk=None):
    """Build the kernel body (all structure static).

    ``sdt``: the STORAGE dtype of g/x/s/r/p (f32 or bf16); all compute and
    every dot accumulates in f32 (the engine tier contract).  ``pin_x``:
    True pins the whole x in VMEM (zero per-iteration x traffic); False
    streams x chunk-wise alongside r/p — required once x alone outgrows
    the VMEM budget (f32 n >= 2^25, bf16 n >= 2^26).  ``with_init``: the
    init dot group (rv0, ar0, nr0, m0, mA0, UU) arrives as SMEM scalars
    after the aux block — the init pass is SKIPPED entirely (no g read,
    no r write, no reduction) and the loop's first iteration reads its r
    chunks straight from the g buffer (conditional DMA source).

    ``prec_chunk``: optional chunk generator of the DIAGONAL of
    P = M^{-1/2} (the elementwise preconditioner of the reference's
    hot-loop-native preconditioned STPCG,
    ``IterativeSolvers.h:236-252,388-404``).  The kernel then runs the
    symmetric change of variables s = P shat entirely in registers —
    ghat = P g (folded into the init pass's one g read), A0hat = P^2 A0,
    Uhat_j = P u_j (the chunk generators compose; ``linalg/flat_cg
    ._fold_prec`` is the whole-array analog) — at ZERO extra streams per
    iteration: the operator family diag + (w .* x) B (w .* x)' is closed
    under elementwise folding.  The kernel's outputs are then the HATTED
    s (the caller un-transforms once) with sk2 already the |s|_M trust-
    region norm and the truncation running in |r|_{M^{-1}}."""
    nch = n_rows // cr
    assert nch >= 2, "need >= 2 chunks for the double-buffered pipeline"

    if prec_chunk is None:
        def w_chunk(j, i0, aux):
            return None if weights[j] is None else weights[j](i0, aux)
    else:
        base_a0 = a0_chunk

        def a0_chunk(i0, aux):                       # noqa: F811
            pr = prec_chunk(i0, aux)
            return pr * pr * base_a0(i0, aux)

        def w_chunk(j, i0, aux):
            pr = prec_chunk(i0, aux)
            w = weights[j]
            return pr if w is None else pr * w(i0, aux)

    def kernel(scal_ref, b_ref, g_hbm, x_hbm,
               s_out, r_out, p_out, res_ref,
               x_vmem, gin, rin, pin, sin, rob, pob, sob,
               sem_in, sem_out, sem_x):
        Delta2 = scal_ref[0] * scal_ref[0]
        aux = tuple(scal_ref[1 + j] for j in range(n_aux))
        B = [[b_ref[i, j] for j in range(k_lr)] for i in range(k_lr)]
        f32 = jnp.float32
        zero = jnp.zeros((), f32)
        one = jnp.ones((), f32)
        eps2 = jnp.asarray(epsilon, f32) ** 2
        tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)

        if pin_x:
            # ---- pin x in VMEM for the whole solve ----
            cpx = pltpu.make_async_copy(x_hbm, x_vmem, sem_x)
            cpx.start()
            cpx.wait()

        def x_read(i, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * cr, cr), :], x_vmem.at[slot],
                sem_in.at[slot, 3])

        def x_chunk(i, slot):
            """This chunk's x block in f32 registers (VMEM-pinned or the
            streamed slot buffer)."""
            if pin_x:
                return x_vmem[pl.ds(i * cr, cr), :].astype(jnp.float32)
            return x_vmem[slot].astype(jnp.float32)

        # ============ INIT: threaded scalars (with_init) or the init
        # pass — r <- g, accumulate the init dot group (rv0, ar0, nr0,
        # m0, mA0, UU): one read of g (streamed) + x (from VMEM); r
        # written once. ============
        def g_read(i, slot):
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(i * cr, cr), :], gin.at[slot],
                sem_in.at[slot, 0])

        def r_write_init(i, slot):
            return pltpu.make_async_copy(
                rob.at[slot], r_out.at[pl.ds(i * cr, cr), :],
                sem_out.at[slot, 0])

        if not with_init:
            g_read(0, 0).start()
            if not pin_x:
                x_read(0, 0).start()

        def init_chunk(i, carry):
            (rv0, ar0, nr0, m0, mA0, UU) = carry
            slot = i % 2

            @pl.when(i + 1 < nch)
            def _():
                g_read(i + 1, (i + 1) % 2).start()
                if not pin_x:
                    x_read(i + 1, (i + 1) % 2).start()

            g_read(i, slot).wait()
            if not pin_x:
                x_read(i, slot).wait()
            gc = gin[slot].astype(jnp.float32)
            xc = x_chunk(i, slot)
            i0 = i * cr
            if prec_chunk is not None:
                # fold ghat = P g into the one g read; r0 <- ghat below,
                # so every later stream is already in hat coordinates
                gc = prec_chunk(i0, aux) * gc
            a0 = a0_chunk(i0, aux)
            a0g = a0 * gc
            ws = [w_chunk(j, i0, aux) for j in range(k_lr)]
            us = [xc if w is None else w * xc for w in ws]

            rv0 = rv0 + jnp.sum(gc * gc)
            ar0 = ar0 + jnp.sum(a0g * gc)
            nr0 = nr0 + jnp.sum(a0g * a0g)
            m0 = tuple(m0[j] + jnp.sum(us[j] * gc) for j in range(k_lr))
            mA0 = tuple(mA0[j] + jnp.sum(us[j] * a0g) for j in range(k_lr))
            UU = tuple(tuple(
                UU[a][b] + (jnp.sum(us[a] * us[b]) if b >= a else zero)
                for b in range(k_lr)) for a in range(k_lr))

            @pl.when(i >= 2)
            def _():
                r_write_init(i - 2, slot).wait()

            rob[slot] = gc.astype(sdt)
            r_write_init(i, slot).start()
            return (rv0, ar0, nr0, m0, mA0, UU)

        z_k = (zero,) * k_lr
        z_kk = tuple((zero,) * k_lr for _ in range(k_lr))
        if with_init:
            # The dot group rode the caller's fused pass (flat_init_dots /
            # sphere_rayleigh_step): unpack from SMEM; no init pass runs
            # and r's storage stays untouched — the first loop iteration
            # streams its r chunks from g_hbm instead.
            base = 1 + n_aux
            rv0, ar0, nr0 = (scal_ref[base], scal_ref[base + 1],
                             scal_ref[base + 2])
            m0 = tuple(scal_ref[base + 3 + j] for j in range(k_lr))
            mA0 = tuple(scal_ref[base + 3 + k_lr + j] for j in range(k_lr))
            ub = base + 3 + 2 * k_lr
            UU = [[scal_ref[ub + a * k_lr + b] for b in range(k_lr)]
                  for a in range(k_lr)]
        else:
            rv0, ar0, nr0, m0, mA0, UU = jax.lax.fori_loop(
                0, nch, init_chunk, (zero, zero, zero, z_k, z_k, z_kk))
            # drain the last two init writes before the loop reads r
            r_write_init(nch - 2, (nch - 2) % 2).wait()
            r_write_init(nch - 1, (nch - 1) % 2).wait()
            # symmetrize UU (only the upper triangle was accumulated)
            UU = [[UU[min(a, b)][max(a, b)] for b in range(k_lr)]
                  for a in range(k_lr)]

        r0n = jnp.sqrt(rv0)
        target = r0n * jnp.minimum(jnp.asarray(kappa_fgr, f32),
                                   _pow(r0n, theta))

        # ============ CG LOOP (flat_cg.half semantics; ``pair`` defers
        # the s update into the next half: the deferring half streams
        # r/p only — 4n words — and the applying half folds the pending
        # coefficient into its own 6n-word s update, averaging 5n) ======
        def rps_read(i, slot, with_s, from_g=None):
            i0 = pl.ds(i * cr, cr)
            if with_init:
                # first loop iteration: r IS g (the init pass that would
                # have copied g into r's storage was skipped)
                @pl.when(from_g)
                def _():
                    pltpu.make_async_copy(g_hbm.at[i0, :], rin.at[slot],
                                          sem_in.at[slot, 0]).start()

                @pl.when(~from_g)
                def _():
                    pltpu.make_async_copy(r_out.at[i0, :], rin.at[slot],
                                          sem_in.at[slot, 0]).start()
            else:
                pltpu.make_async_copy(r_out.at[i0, :], rin.at[slot],
                                      sem_in.at[slot, 0]).start()
            pltpu.make_async_copy(p_out.at[i0, :], pin.at[slot],
                                  sem_in.at[slot, 1]).start()
            if with_s:
                pltpu.make_async_copy(s_out.at[i0, :], sin.at[slot],
                                      sem_in.at[slot, 2]).start()

        def rps_read_wait(i, slot, with_s, from_g=None):
            i0 = pl.ds(i * cr, cr)
            if with_init:
                @pl.when(from_g)
                def _():
                    pltpu.make_async_copy(g_hbm.at[i0, :], rin.at[slot],
                                          sem_in.at[slot, 0]).wait()

                @pl.when(~from_g)
                def _():
                    pltpu.make_async_copy(r_out.at[i0, :], rin.at[slot],
                                          sem_in.at[slot, 0]).wait()
            else:
                pltpu.make_async_copy(r_out.at[i0, :], rin.at[slot],
                                      sem_in.at[slot, 0]).wait()
            pltpu.make_async_copy(p_out.at[i0, :], pin.at[slot],
                                  sem_in.at[slot, 1]).wait()
            if with_s:
                pltpu.make_async_copy(s_out.at[i0, :], sin.at[slot],
                                      sem_in.at[slot, 2]).wait()

        def rps_write(i, slot, with_s):
            i0 = pl.ds(i * cr, cr)
            pltpu.make_async_copy(rob.at[slot], r_out.at[i0, :],
                                  sem_out.at[slot, 0]).start()
            pltpu.make_async_copy(pob.at[slot], p_out.at[i0, :],
                                  sem_out.at[slot, 1]).start()
            if with_s:
                pltpu.make_async_copy(sob.at[slot], s_out.at[i0, :],
                                      sem_out.at[slot, 2]).start()

        def rps_write_wait(i, slot, with_s):
            i0 = pl.ds(i * cr, cr)
            pltpu.make_async_copy(rob.at[slot], r_out.at[i0, :],
                                  sem_out.at[slot, 0]).wait()
            pltpu.make_async_copy(pob.at[slot], p_out.at[i0, :],
                                  sem_out.at[slot, 1]).wait()
            if with_s:
                pltpu.make_async_copy(sob.at[slot], s_out.at[i0, :],
                                      sem_out.at[slot, 2]).wait()

        # carry: (k, rv, ar, nr, pa, nAp, rv_prev, alpha_prev, pr_c,
        #         kappa_prev, s_p, sk2, pp_prev, mval, done, boundary,
        #         s_valid, p_valid, m[k], mA[k], mB[k], mp[k])
        def carry_pack(k, scal, m, mA, mB, mp):
            return (k,) + tuple(scal) + tuple(m) + tuple(mA) + tuple(mB) \
                + tuple(mp)

        N_SCAL = 17

        def carry_unpack(c):
            k = c[0]
            scal = list(c[1:1 + N_SCAL])
            rest = c[1 + N_SCAL:]
            m = list(rest[0:k_lr])
            mA = list(rest[k_lr:2 * k_lr])
            mB = list(rest[2 * k_lr:3 * k_lr])
            mp = list(rest[3 * k_lr:4 * k_lr])
            return k, scal, m, mA, mB, mp

        def cond(c):
            k, scal, *_ = carry_unpack(c)
            rv, done = scal[0], scal[13]
            return ((k < max_iterations) & (done == zero)
                    & (jnp.sqrt(rv) > target))

        def half(c, pend, apply_s):
            """One CG iteration (mirrors flat_cg._stpcg_flat_pair.half):
            ``apply_s=False`` defers the s coefficient into ``pend_out``
            and skips the s streams; ``apply_s=True`` folds ``pend`` into
            its s update.  ``frozen`` replays the XLA engine's gating so
            within-pair exits keep identical semantics (the while cond is
            only evaluated between pairs)."""
            k, scal, m, mA, mB, mp = carry_unpack(c)
            (rv, ar, nr, pa, nAp, rv_prev, alpha_prev, pr_c, kappa_prev,
             s_p, sk2, pp_prev, mval, done, bnd, s_valid,
             p_valid) = scal
            frozen = ((done != zero) | (k >= max_iterations)
                      | (jnp.sqrt(rv) <= target))

            first = rv_prev == zero
            beta = jnp.where(first, zero,
                             rv / jnp.where(first, one, rv_prev))

            Bm = _matk(B, m)
            wr = ar + _kdot(m, Bm)
            kappa = wr - (beta / alpha_prev) * rv
            pp_k = rv + beta * beta * pp_prev
            pr_k = -rv + beta * (pr_c + alpha_prev * kappa_prev)
            sp_k = beta * (s_p + alpha_prev * pp_prev)

            # kernel-of-H safeguard via the |q|^2 recurrence
            Bmp = _matk(B, mp)
            UUBm = _matk(UU, Bm)
            UUBmp = _matk(UU, Bmp)
            ww = nr + 2.0 * _kdot(mA, Bm) + _kdot(Bm, UUBm)
            wq = (pa + _kdot(mA, Bmp) + _kdot(Bm, mB)
                  + _kdot(Bm, UUBmp))
            qq_prev = nAp + 2.0 * _kdot(mB, Bmp) + _kdot(Bmp, UUBmp)
            qq_k = ww - 2.0 * beta * wq + beta * beta * qq_prev
            in_kernel = qq_k < eps2 * pp_k
            sign = jnp.where(in_kernel & (pr_k > 0), -one, one)

            sp_eff = sign * sp_k
            disc = sp_eff * sp_eff + pp_k * (Delta2 - sk2)
            sigma = ((-sp_eff + jnp.sqrt(jnp.maximum(disc, 0.0)))
                     / jnp.maximum(pp_k, tiny))

            alpha = rv / kappa
            sk2_next = sk2 + 2.0 * alpha * sp_k + alpha * alpha * pp_k
            boundary = (in_kernel | (kappa <= 0)
                        | (sk2_next > Delta2)) & ~frozen

            cs = jnp.where(boundary, sigma * sign, alpha)
            cs = jnp.where(frozen, zero, cs)
            crr = jnp.where(boundary | frozen, zero, alpha)
            m_new = jnp.where(
                frozen, mval,
                jnp.where(boundary,
                          mval + sigma * sign * pr_k
                          + 0.5 * sigma * sigma * kappa,
                          mval - 0.5 * alpha * rv))

            mp_k = [-m[j] + beta * mp[j] for j in range(k_lr)]
            mB2 = [-mA[j] + beta * mB[j] for j in range(k_lr)]
            Bmpk = _matk(B, mp_k)
            UUBmpk = _matk(UU, Bmpk)
            m2 = [m[j] + crr * (mB2[j] + UUBmpk[j]) for j in range(k_lr)]
            nAp2 = nr - 2.0 * beta * pa + beta * beta * nAp

            # ---- THE streamed pass: r/p (+s when applying) in and out,
            # x from VMEM, diagonal regenerated per chunk ----
            rps_read(0, 0, apply_s, from_g=first)
            if not pin_x:
                x_read(0, 0).start()

            def chunk(i, acc):
                rv2, ar2, nr2, pa2, mA2 = acc
                slot = i % 2

                @pl.when(i + 1 < nch)
                def _():
                    rps_read(i + 1, (i + 1) % 2, apply_s, from_g=first)
                    if not pin_x:
                        x_read(i + 1, (i + 1) % 2).start()

                rps_read_wait(i, slot, apply_s, from_g=first)
                if not pin_x:
                    x_read(i, slot).wait()
                rc = rin[slot].astype(jnp.float32)
                pc = pin[slot].astype(jnp.float32)
                xc = x_chunk(i, slot)
                i0 = i * cr
                a0 = a0_chunk(i0, aux)
                ws = [w_chunk(j, i0, aux) for j in range(k_lr)]
                us = [xc if w is None else w * xc for w in ws]

                p2 = jnp.where(first, -rc, -rc + beta * pc)
                q2 = a0 * p2
                for j in range(k_lr):
                    q2 = q2 + Bmpk[j] * us[j]
                r2 = rc + crr * q2

                a0r2 = a0 * r2
                a0p2 = a0 * p2
                rv2 = rv2 + jnp.sum(r2 * r2)
                ar2 = ar2 + jnp.sum(a0r2 * r2)
                nr2 = nr2 + jnp.sum(a0r2 * a0r2)
                pa2 = pa2 + jnp.sum(a0r2 * a0p2)
                mA2 = tuple(mA2[j] + jnp.sum(us[j] * a0r2)
                            for j in range(k_lr))

                @pl.when(i >= 2)
                def _():
                    rps_write_wait(i - 2, slot, apply_s)

                rob[slot] = r2.astype(sdt)
                pob[slot] = p2.astype(sdt)
                if apply_s:
                    sc = sin[slot].astype(jnp.float32)
                    # first-iteration guards: the s and p buffers hold
                    # garbage (possibly NaN) before their first write, and
                    # 0 * NaN = NaN — select, don't scale
                    sob[slot] = (jnp.where(s_valid != zero, sc, 0.0)
                                 + jnp.where(p_valid != zero,
                                             pend * pc, 0.0)
                                 + cs * p2).astype(sdt)
                rps_write(i, slot, apply_s)
                return (rv2, ar2, nr2, pa2, mA2)

            rv2, ar2, nr2, pa2, mA2 = jax.lax.fori_loop(
                0, nch, chunk, (zero, zero, zero, zero, z_k))
            rps_write_wait(nch - 2, nch % 2, apply_s)
            rps_write_wait(nch - 1, (nch + 1) % 2, apply_s)

            exit_now = boundary | frozen
            scal_new = [
                jnp.where(exit_now, rv, rv2), ar2, nr2, pa2, nAp2,
                jnp.where(exit_now, rv_prev, rv),
                jnp.where(exit_now, alpha_prev, alpha),
                jnp.where(exit_now, pr_c, pr_k),
                jnp.where(exit_now, kappa_prev, kappa),
                jnp.where(exit_now, s_p, sp_k),
                jnp.where(exit_now, sk2, sk2_next),
                jnp.where(exit_now, pp_prev, pp_k),
                m_new,
                jnp.where(boundary, one, done),
                jnp.where(frozen, bnd, jnp.where(boundary, one, bnd)),
                one if apply_s else s_valid,
                one,                             # p written every half
            ]
            k_new = jnp.where(exit_now, k, k + 1)
            pend_out = zero if apply_s else cs
            return carry_pack(k_new, scal_new, m2, mA2, mB2, mp_k), pend_out

        if pair:
            def body(c):
                c1, pend = half(c, zero, apply_s=False)
                c2, _ = half(c1, pend, apply_s=True)
                return c2
        else:
            def body(c):
                c1, _ = half(c, zero, apply_s=True)
                return c1

        scal0 = [rv0, ar0, nr0, zero, zero,     # rv, ar, nr, pa, nAp
                 zero, one, zero, one,          # rv_prev, alpha_prev, pr, kp
                 zero, zero, zero, zero,        # s_p, sk2, pp_prev, mval
                 zero, zero, zero, zero]  # done, boundary, s/p_valid
        c0 = carry_pack(jnp.zeros((), jnp.int32), scal0, m0, mA0,
                        z_k, z_k)
        cF = jax.lax.while_loop(cond, body, c0)
        kF, scalF, *_ = carry_unpack(cF)

        res_ref[0, 0] = kF.astype(f32)
        res_ref[1, 0] = scalF[14]               # boundary flag
        res_ref[2, 0] = scalF[10]               # sk2
        res_ref[3, 0] = scalF[12]               # mval

    return kernel


def stpcg_flat_streamed(
    g: jnp.ndarray,
    x: jnp.ndarray,
    B: jnp.ndarray,
    Delta,
    aux_scalars=(),
    *,
    a0_chunk: Callable,
    weights: Sequence[Optional[Callable]],
    max_iterations: int = 1000,
    kappa_fgr: float = 0.1,
    theta: float = 0.5,
    epsilon: float = 1e-8,
    chunk_rows: int = DEF_CHUNK_ROWS,
    body_kind: str = "pair",
    pin_x: Optional[bool] = None,
    init=None,
    prec_chunk: Optional[Callable] = None,
    prec: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    interpret: bool = False,
) -> FlatCGResult:
    """Solve the flat trust-region subproblem with the whole-loop streamed
    kernel (module docstring).  ``g``/``x`` are flat (n,) f32 with n a
    multiple of ``chunk_rows * 128``; ``aux_scalars`` are traced scalars
    forwarded to the chunk generators.  Returns the same
    :class:`FlatCGResult` as ``stpcg_flat`` (s, M-norm, iterations,
    predicted decrease).

    ``body_kind``: ``"pair"`` (default) defers each even iteration's s
    coefficient into the next half's fused s update — 4n words deferring
    / 6n applying, 5n average; ``"single"`` applies s every iteration
    (6n).  Unlike the XLA engine (where the single body wins the VMEM-
    resident regime), the kernel always streams, so pair is the measured
    winner at every size the kernel accepts.

    ``init``: an optional ``linalg.flat_cg.FlatCGInit`` — the pre-loop dot
    group computed inside an earlier fused pass (e.g. the TNT trial-step
    evaluator's ``aux.init``).  The kernel then skips its init pass
    ENTIRELY (no g read, no r0 write, no pre-loop reduction — the loop's
    first iteration streams r straight from the g buffer), mirroring the
    XLA engine's ``stpcg_flat(init=)``.  NB the threaded group is
    accumulated whole-array by the caller while the kernel's own init
    accumulates chunk-wise: the two differ at the f32 ulp level, so this
    is CONTRACT parity, not bitwise (same as the kernel-vs-XLA story).

    ``prec_chunk`` / ``prec``: the elementwise M^{-1/2} preconditioner in
    BOTH forms — ``prec_chunk(i0, aux) -> (cr, 128)`` generating P's
    diagonal chunk-wise (folded into the kernel's registers at zero extra
    streams per iteration, see ``_mk_kernel``) and ``prec(v)`` the
    whole-array apply (one 2n-word un-transform pass ``s = P shat``
    AFTER the loop).  The two MUST compute the same map.  Semantics match
    ``linalg/flat_cg.stpcg_flat(prec=)`` — truncation in |r|_{M^{-1}},
    trust region / reported step norm in |s|_M, kernel-of-H safeguard on
    the TRANSFORMED operator (reference hot-loop preconditioning,
    ``IterativeSolvers.h:236-252,388-404``) — and like the XLA engine it
    is incompatible with ``init=`` (the threaded dot group is computed in
    untransformed coordinates).
    """
    n = g.shape[0]
    sdt = g.dtype
    if sdt not in (jnp.float32, jnp.bfloat16):
        raise ValueError("streamed kernel storage dtype must be f32 or "
                         "bf16 (all compute accumulates in f32)")
    if x.dtype != sdt:
        raise ValueError("g and x must share the storage dtype")
    if n % (chunk_rows * LANES):
        raise ValueError(f"n={n} must be a multiple of "
                         f"{chunk_rows * LANES} for the streamed kernel")
    n_rows = n // LANES
    k_lr = len(weights)
    B = jnp.asarray(B, jnp.float32)
    if B.shape != (k_lr, k_lr):
        raise ValueError("B must be (k, k) with k = len(weights)")
    n_aux = len(aux_scalars)

    if body_kind not in ("single", "pair"):
        raise ValueError('body_kind must be "single" or "pair"')
    if (prec_chunk is None) != (prec is None):
        raise ValueError(
            "preconditioning needs BOTH forms of the same elementwise "
            "M^{-1/2}: prec_chunk (in-kernel folding) and prec (the "
            "whole-array un-transform of s)")
    if prec_chunk is not None and init is not None:
        raise ValueError(
            "init= (the precomputed pre-loop dot group) is computed in "
            "untransformed coordinates and cannot be combined with "
            "prec_chunk=; compute the group on the transformed data "
            "instead (same contract as linalg/flat_cg.stpcg_flat)")
    # Pin x in VMEM when it fits the budget (zero per-iteration x
    # traffic); else stream it chunk-wise alongside r/p (+2 slot buffers).
    itemsize = jnp.dtype(sdt).itemsize
    x_bytes = n_rows * LANES * itemsize
    if pin_x is None:
        pin_x = x_bytes <= PIN_X_BUDGET
    kernel = _mk_kernel(n_rows, chunk_rows, k_lr, a0_chunk, weights,
                        max_iterations, float(kappa_fgr), float(theta),
                        float(epsilon), n_aux, body_kind == "pair",
                        sdt, pin_x, with_init=init is not None,
                        prec_chunk=prec_chunk)

    scal_list = ([jnp.asarray(Delta, jnp.float32)]
                 + [jnp.asarray(a, jnp.float32) for a in aux_scalars])
    if init is not None:
        iv = [init.rv, init.ar, init.nr]
        iv += [init.m[j] for j in range(k_lr)]
        iv += [init.mA[j] for j in range(k_lr)]
        iv += [init.UU[a, b] for a in range(k_lr) for b in range(k_lr)]
        scal_list += [jnp.asarray(v, jnp.float32) for v in iv]
    scal = jnp.stack(scal_list)
    shp = jax.ShapeDtypeStruct((n_rows, LANES), sdt)
    cr = chunk_rows
    x_vmem_shape = ((n_rows, LANES) if pin_x else (2, cr, LANES))

    s2d, _r2d, _p2d, res = pl.pallas_call(
        kernel,
        out_shape=(shp, shp, shp,
                   jax.ShapeDtypeStruct((4, 1), jnp.float32)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),       # B
            pl.BlockSpec(memory_space=pl.ANY),           # g
            pl.BlockSpec(memory_space=pl.ANY),           # x
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),    # s
                   pl.BlockSpec(memory_space=pl.ANY),    # r scratch
                   pl.BlockSpec(memory_space=pl.ANY),    # p scratch
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[
            pltpu.VMEM(x_vmem_shape, sdt),               # x (pin or slots)
            pltpu.VMEM((2, cr, LANES), sdt),             # g in
            pltpu.VMEM((2, cr, LANES), sdt),             # r in
            pltpu.VMEM((2, cr, LANES), sdt),             # p in
            pltpu.VMEM((2, cr, LANES), sdt),             # s in
            pltpu.VMEM((2, cr, LANES), sdt),             # r out
            pltpu.VMEM((2, cr, LANES), sdt),             # p out
            pltpu.VMEM((2, cr, LANES), sdt),             # s out
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(x_bytes if pin_x else 0)
            + 16 * cr * LANES * itemsize + 24 * 1024 * 1024),
        interpret=interpret,
    )(scal, B, g.reshape(n_rows, LANES), x.reshape(n_rows, LANES))

    k_it = res[0, 0].astype(jnp.int32)
    boundary = res[1, 0] > 0.5
    sk2 = res[2, 0]
    mval = res[3, 0]
    Delta_f = jnp.asarray(Delta, jnp.float32)
    m_norm = jnp.where(boundary, Delta_f, jnp.sqrt(sk2))
    s = s2d.reshape(n)
    if prec is not None:
        # un-transform the step (s = P shat), one elementwise pass; the
        # M-norm and model decrease are already the reference's
        # preconditioned quantities (see _fold_prec in linalg/flat_cg)
        s = prec(s.astype(jnp.float32)).astype(sdt)
    return FlatCGResult(s=s, update_step_M_norm=m_norm,
                        num_iterations=k_it, predicted_decrease=-mval)


def sphere_rayleigh_streamed(a_chunk: Callable, n_aux: int = 1):
    """Streamed-kernel operator bundle for the sphere Rayleigh quotient.

    ``a_chunk(i0, aux) -> (cr, 128)`` generates the diagonal of A for rows
    [i0, i0+cr); ``aux[0]`` must be the Rayleigh quotient rq = <x, 2Ax>.
    Returns ``(a0_chunk, weights, B_fn)`` implementing
    A0 = 2A - rq I, U = (x, 2Ax), B = [[2rq, -1], [-1, 0]]
    (``flat_cg.sphere_rayleigh_flat``; reference Hessian seam
    ``TNT.h:394-426``)."""

    def a0_chunk(i0, aux):
        return 2.0 * a_chunk(i0, aux) - aux[0]

    def w1(i0, aux):
        return 2.0 * a_chunk(i0, aux)

    def B_fn(rq):
        return jnp.asarray([[2.0 * rq, -1.0], [-1.0, 0.0]], jnp.float32)

    return a0_chunk, (None, w1), B_fn
