"""Probe: can a whole-loop Pallas kernel beat XLA in the VMEM-RESIDENT regime?

The round-4 streamed kernel won the > VMEM regime (0.80 of spec HBM,
``probe_pallas_stream.py``).  This probe asks the same question for the
bf16 HEADLINE tier (n = 2^24, 4 bf16 loop vectors = 128 MiB — exactly at
the measured residency boundary): the XLA single body runs at ~0.19-0.20
ms/CG-iteration (bench.py: ~5000 it/s incl. outer overhead, 1174 GB/s
APPARENT of its 7n word accounting), far below VMEM speeds, so it is
VPU-op-bound, partially spilling, or scheduling-bound — a hand kernel
that pins x/r/p in VMEM (96 MiB) and touches HBM only for s (deferred to
every other iteration by the pair trick; ~2n bytes/iter average) has
headroom if and only if the pinned-VMEM compute chain itself runs faster.

Arms (same math everywhere: the streamed kernel's chunk body — a0 regen,
sphere U group, p/r updates, the full 6-reduction dot group — bf16
storage, f32 compute, with a cross-iteration scalar dependence so
nothing folds away):

  xla3  fori_loop over (r, p) carry + invariant x, NO s   — 96 MiB state
  xla4  same + an s update in the carry                   — 128 MiB state
        (the current headline body's live set, at the boundary)
  pal3  Pallas: x/r/p pinned in VMEM scratch, no HBM traffic in the loop

pal3 vs xla3 isolates kernel-vs-XLA on identical resident work; xla4 vs
xla3 measures what the 4th vector (the boundary) costs XLA; pal3 vs xla4
bounds the real win available to a resident streamed-s kernel (its s
stream, ~33 MB/iter at the 660 GB/s DMA envelope = 0.05 ms, overlaps
compute unless compute drops below that).

Timing: two-point slope over (K_LO, K_HI) iteration counts, best of 3 —
the only valid methodology over the tunnel (docs/ROADMAP.md).

MEASURED VERDICT (v5e, 2026-08-19, 4 process-level repeats):

  xla3     0.108-0.122 ms/iter (one early outlier measured 0.036 once and
           never reproduced across 3 dedicated reruns — treat as a fluke)
  xla4     0.122-0.123 ms/iter (stable)
  xla3rec  0.123 ms/iter (coefficient recording is free)
  pal3     0.269 ms/iter — the Pallas in-residence loss again (round 3's
           per-op finding reproduced at whole-loop granularity: Mosaic's
           sequential chunk loop over pinned VMEM does not reach XLA's
           fused whole-array schedule)
  replay   0.148 ms/iter marginal + ~24 ms/pass — the segmented scan does
           NOT run at resident speed (the per-segment state churn defeats
           the residency win the pass was designed around)

Conclusions: (1) there is NO 3-vs-4-vector residency cliff at n=2^24
bf16 — both run ~1900-2200 GB/s apparent, VPU/schedule-bound, so the
s-dropping replay-engine design has no premise and is NOT built;
(2) the production single body (~0.13 ms/CG-iter from bench.py's split)
already runs at this probe's ceiling — the headline's remaining slack is
the ~1.8-2.2 ms/outer fixed cost, not the CG body;
(3) in-residence Pallas stays a negative verdict at every granularity.
"""

import functools
import os
import sys
import time

import jax

TEST = bool(os.environ.get("PROBE_TEST"))
if TEST:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _util import chip_bandwidth  # noqa: E402

N = (1 << 13) if TEST else (1 << 24)
ROWS = N // 128
CR = 16 if TEST else int(os.environ.get("PROBE_CR", "2048"))
NCH = ROWS // CR
SDT = jnp.bfloat16       # storage dtype (the headline tier)
F32 = jnp.float32


def _mat(out):
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def slope_time(fn_lo, fn_hi, args, k_lo, k_hi, reps=3):
    _mat(fn_lo(*args)); _mat(fn_hi(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); _mat(fn_lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _mat(fn_hi(*args))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
    return best


def a_chunk(i0, cr=CR):
    """Affine diagonal rows [i0, i0+cr) (int32 iota: Mosaic requirement)."""
    b = 999.0 / (N - 1)
    row = (jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 0).astype(F32)
           + jnp.asarray(i0, F32))
    lane = jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 1).astype(F32)
    return 1.0 + b * (row * 128.0 + lane)


def body_math(rc, pc, xc, a, coefs):
    """One chunk of the CG body (mirrors kernels/streamed_cg.py chunk()):
    returns (rn, pn, partial dot tuple).  All f32; storage casts happen at
    the caller."""
    beta, crr, c0, c1, rq = coefs
    a0 = 2.0 * a - rq
    u1 = (2.0 * a) * xc
    pn = -rc + beta * pc
    q = a0 * pn + c0 * xc + c1 * u1
    rn = rc + crr * q
    a0r = a0 * rn
    a0p = a0 * pn
    dots = (jnp.sum(rn * rn), jnp.sum(a0r * rn), jnp.sum(a0r * a0r),
            jnp.sum(a0r * a0p), jnp.sum(xc * a0r), jnp.sum(u1 * a0r))
    return rn, pn, dots


def coefs_from(dots):
    """Cross-iteration scalar coupling (keeps every dot live, values tame)."""
    rv, ar, nr, pa, m0, m1 = dots
    beta = 1e-7 * rv / (1.0 + jnp.abs(ar))
    crr = -1e-7 * rv / (1.0 + nr)
    c0 = 1e-9 * pa / (1.0 + jnp.abs(m0))
    c1 = 1e-9 * m1 / (1.0 + nr)
    rq = 500.0 + 1e-6 * rv
    return (beta, crr, c0, c1, rq)


# ------------------------------------------------------------------ XLA arms
def mk_xla(K, with_s):
    def a_full():
        return a_chunk(0, cr=ROWS)

    @jax.jit
    def run(r, p, x, s):
        def body(i, carry):
            r, p, s, dots = carry
            coefs = coefs_from(dots)
            rn, pn, d = body_math(r.astype(F32), p.astype(F32),
                                  x.astype(F32), a_full(), coefs)
            if with_s:
                s = (s.astype(F32) + coefs[1] * pn).astype(SDT)
            return (rn.astype(SDT), pn.astype(SDT), s, d)
        z = jnp.zeros((), F32)
        r, p, s, dots = jax.lax.fori_loop(
            0, K, body, (r, p, s, (jnp.sum(r.astype(F32) ** 2),
                                   z, z, z, z, z)))
        return dots[0] + dots[3]
    return run


# ------------------------------------------------- replay-engine probe arms
def mk_xla3_rec(K):
    """xla3 + per-iteration coefficient recording (4 scalars/iter via
    .at[k].set into fixed arrays in the carry) — does recording disturb
    residency/fusion?"""
    def a_full():
        return a_chunk(0, cr=ROWS)

    @jax.jit
    def run(r, p, x, s):
        rec0 = jnp.zeros((4, K), F32)

        def body(i, carry):
            r, p, rec, dots = carry
            coefs = coefs_from(dots)
            rn, pn, d = body_math(r.astype(F32), p.astype(F32),
                                  x.astype(F32), a_full(), coefs)
            rec = rec.at[:, i].set(jnp.stack([coefs[0], coefs[1],
                                              coefs[2], coefs[3]]))
            return (rn.astype(SDT), pn.astype(SDT), rec, d)
        z = jnp.zeros((), F32)
        r, p, rec, dots = jax.lax.fori_loop(
            0, K, body, (r, p, rec0, (jnp.sum(r.astype(F32) ** 2),
                                      z, z, z, z, z)))
        return dots[0] + dots[3] + jnp.sum(rec)
    return run


REPLAY_CHUNKS = 4 if TEST else 16   # segments: 4 x n/16 bf16 = 8 MiB state


def mk_replay(K):
    """The s-reconstruction pass: scan over segments; per segment replay
    all K iterations with (s, r, p) chunk state + x chunk invariant fully
    resident, all coefficients known (no reductions).  HBM: read g + x
    segment once, write s segment once — 3n words TOTAL for the pass."""
    seg_rows = ROWS // REPLAY_CHUNKS

    def a_seg(c, cr=seg_rows):
        b = 999.0 / (N - 1)
        row = (jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 0).astype(F32)
               + (c * seg_rows).astype(F32))
        lane = jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 1).astype(F32)
        return 1.0 + b * (row * 128.0 + lane)

    @jax.jit
    def run(g, x, rec):
        # rec: (4, K) f32 coefficient schedule (beta, crr, c0, c1)
        g3 = g.reshape(REPLAY_CHUNKS, seg_rows, 128)
        x3 = x.reshape(REPLAY_CHUNKS, seg_rows, 128)

        def seg(c, gx):
            gc, xc = gx
            a = a_seg(c)
            u1 = (2.0 * a) * xc.astype(F32)
            a0 = 2.0 * a - 500.0

            def it(i, carry):
                s, r, p = carry
                beta, crr, c0, c1 = rec[0, i], rec[1, i], rec[2, i], rec[3, i]
                rf = r.astype(F32)
                pn = -rf + beta * p.astype(F32)
                q = a0 * pn + c0 * xc.astype(F32) + c1 * u1
                rn = rf + crr * q
                sn = (s.astype(F32) + crr * pn).astype(SDT)
                return (sn, rn.astype(SDT), pn.astype(SDT))

            s0 = jnp.zeros((seg_rows, 128), SDT)
            s, _, _ = jax.lax.fori_loop(0, K, it, (s0, gc, gc))
            return c + 1, s

        _, s3 = jax.lax.scan(seg, 0, (g3, x3))
        return s3.reshape(ROWS, 128)
    return run


# --------------------------------------------------------------- Pallas arm
def mk_pallas(K):
    """x/r/p pinned in VMEM; the CG loop never touches HBM."""

    def kernel(r_hbm, p_hbm, x_hbm, r_out, acc_out,
               x_vmem, r_vmem, p_vmem, sem):
        pltpu.make_async_copy(x_hbm, x_vmem, sem.at[0]).start()
        pltpu.make_async_copy(r_hbm, r_vmem, sem.at[1]).start()
        pltpu.make_async_copy(p_hbm, p_vmem, sem.at[2]).start()
        pltpu.make_async_copy(x_hbm, x_vmem, sem.at[0]).wait()
        pltpu.make_async_copy(r_hbm, r_vmem, sem.at[1]).wait()
        pltpu.make_async_copy(p_hbm, p_vmem, sem.at[2]).wait()
        z = jnp.zeros((), F32)

        def iter_body(k, dots):
            coefs = coefs_from(dots)

            def chunk(i, acc):
                i0 = pl.ds(i * CR, CR)
                rc = r_vmem[i0, :].astype(F32)
                pc = p_vmem[i0, :].astype(F32)
                xc = x_vmem[i0, :].astype(F32)
                rn, pn, d = body_math(rc, pc, xc, a_chunk(i * CR), coefs)
                r_vmem[i0, :] = rn.astype(SDT)
                p_vmem[i0, :] = pn.astype(SDT)
                return tuple(a + b for a, b in zip(acc, d))

            return jax.lax.fori_loop(0, NCH, chunk, (z,) * 6)

        rv0 = jax.lax.fori_loop(
            0, NCH, lambda i, a: a + jnp.sum(
                r_vmem[pl.ds(i * CR, CR), :].astype(F32) ** 2), z)
        dots = jax.lax.fori_loop(0, K, iter_body, (rv0, z, z, z, z, z))
        pltpu.make_async_copy(r_vmem, r_out, sem.at[1]).start()
        pltpu.make_async_copy(r_vmem, r_out, sem.at[1]).wait()
        acc_out[0, 0] = dots[0] + dots[3]

    shp = jax.ShapeDtypeStruct((ROWS, 128), SDT)

    @jax.jit
    def run(r, p, x, s):
        _r, acc = pl.pallas_call(
            kernel,
            out_shape=(shp, jax.ShapeDtypeStruct((1, 1), F32)),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=[
                pltpu.VMEM((ROWS, 128), SDT),     # x pinned (32 MiB bf16)
                pltpu.VMEM((ROWS, 128), SDT),     # r pinned
                pltpu.VMEM((ROWS, 128), SDT),     # p pinned
                pltpu.SemaphoreType.DMA((3,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=3 * ROWS * 128 * 2 + 28 * 1024 * 1024),
            interpret=TEST,
        )(r, p, x)
        return acc[0, 0]

    return run


def main():
    spec, kind = chip_bandwidth()
    print(f"device {kind}, spec {spec:.0f} GB/s, n=2^24 bf16 storage, "
          f"chunk rows {CR} x {NCH}", flush=True)

    r = jax.random.uniform(jax.random.PRNGKey(0), (ROWS, 128), F32,
                           0.5, 1.0).astype(SDT)
    p = jax.random.uniform(jax.random.PRNGKey(1), (ROWS, 128), F32,
                           0.5, 1.0).astype(SDT)
    x = jax.random.uniform(jax.random.PRNGKey(2), (ROWS, 128), F32,
                           0.5, 1.0).astype(SDT)
    s = jnp.zeros((ROWS, 128), SDT)

    if TEST:
        ax = float(mk_xla(3, with_s=False)(r, p, x, s))
        ap = float(mk_pallas(3)(r, p, x, s))
        ok = abs(ax - ap) <= 1e-3 * abs(ax)
        print(f"TEST: xla={ax!r} pallas={ap!r} {'OK' if ok else 'MISMATCH'}")
        return

    K_LO, K_HI = 40, 400
    arms = [
        ("xla3 (r,p,x; 96 MiB)", functools.partial(mk_xla, with_s=False)),
        ("xla4 (r,p,x,s; 128 MiB)", functools.partial(mk_xla, with_s=True)),
        ("xla3rec (+coef recording)", mk_xla3_rec),
        ("pal3 (x/r/p VMEM-pinned)", mk_pallas),
    ]
    only = os.environ.get("PROBE_ARMS", "")
    if only:
        arms = [a for a in arms if a[0].split(" ")[0] in only.split(",")]
    rates = {}
    for name, mk in arms:
        try:
            per_it = slope_time(mk(K_LO), mk(K_HI), (r, p, x, s),
                                K_LO, K_HI)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        rates[name.split(" ")[0]] = per_it
        app = 7 * N * 2 / per_it / 1e9   # apparent GB/s at 7n bf16 words
        print(f"{name:28s} {per_it * 1e3:7.3f} ms/iter -> "
              f"{1.0 / per_it:7.1f} it/s  ({app:6.0f} GB/s apparent @7n)",
              flush=True)

    if not only or "replay" in only:
        # The s-reconstruction pass: slope over K (per-iteration replay
        # cost) + intercept (the 3n-word streamed segment pass).
        g = r.astype(SDT)
        rec_hi = jnp.asarray(
            jax.random.uniform(jax.random.PRNGKey(7), (4, K_HI), F32,
                               -1e-4, 1e-4))
        rec_lo = rec_hi[:, :K_LO]
        # slope_time passes identical args to both arms; the rec schedule
        # shapes differ per K, so time the two arms by hand:
        f_lo, f_hi = mk_replay(K_LO), mk_replay(K_HI)
        _mat(f_lo(g, x, rec_lo)); _mat(f_hi(g, x, rec_hi))
        best_sl, best_lo = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); _mat(f_lo(g, x, rec_lo))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); _mat(f_hi(g, x, rec_hi))
            t_hi = time.perf_counter() - t0
            best_sl = min(best_sl, (t_hi - t_lo) / (K_HI - K_LO))
            best_lo = min(best_lo, t_lo)
        base = max(best_lo - K_LO * best_sl, 0.0)
        print(f"{'replay (s-reconstruction)':28s} {best_sl * 1e3:7.3f} "
              f"ms/iter + {base * 1e3:.1f} ms/pass base", flush=True)
        if "xla3rec" in rates:
            for kk in (30, 50, 100):
                eff = 1.0 / (rates["xla3rec"] + best_sl + base / kk)
                print(f"  -> effective 3-vec+replay @ {kk:3d} CG it/solve: "
                      f"{eff:7.1f} it/s "
                      f"(vs xla4 {1.0 / rates['xla4']:.0f})", flush=True)


if __name__ == "__main__":
    main()
