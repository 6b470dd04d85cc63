"""Probe: can a manual-DMA Pallas kernel beat XLA's streamed-regime CG body?

Round-4 measurement for VERDICT item 1 (the f32 > VMEM tier at 0.62 of
spec HBM).  The hypothesis under test: the XLA pair/single bodies pay for
(a) re-reading the loop-invariant x from HBM every pass (~1n of the ~7n
words/iteration) because XLA residency is all-or-nothing — the four f32
vectors at n=2^24 are 256 MiB, over the ~128 MiB boundary, so NOTHING
stays resident — and (b) whatever the multi-stream fusion envelope loses
vs the 2-3-stream one.  A hand-written whole-loop Pallas kernel can pin
ONLY x (64 MiB) in VMEM and stream r/p (+s) chunk-wise with
double-buffered DMA, making each CG-like iteration 4n (or 6n with s)
real HBM words instead of 5n/7n.

Arms (all f32, n = 2^24, same math: a projected-Hv-like update with a
cross-iteration scalar dependence so nothing folds):

  xla5   read r,p,x write r,p        (5n real words/iter)  — XLA fusion
  xla7   read s,r,p,x write s,r,p    (7n real words/iter)  — XLA fusion
  pal4   read r,p    write r,p       (4n real; x pinned VMEM) — Pallas
  pal6   read s,r,p  write s,r,p     (6n real; x pinned VMEM) — Pallas

Timing: two-point slope over iteration counts (K_lo, K_hi) — single-call
walls are contaminated by the ~26-50 ms tunnel dispatch charge
(docs/ROADMAP.md measurement caveat).  Prints one line per arm: GB/s of
REAL bytes, fraction of spec, and the implied CG it/s at the engine's
own word count.
"""

import functools
import os
import sys
import time

import jax

# TEST mode (PROBE_TEST=1): tiny shapes, CPU interpret — correctness only
TEST = bool(os.environ.get("PROBE_TEST"))
if TEST:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _util import chip_bandwidth  # noqa: E402

N = (1 << 13) if TEST else (1 << 24)
ROWS = N // 128          # 131072 rows of 128 lanes
CR = 16 if TEST else 2048   # chunk rows: 2048*128*4 B = 1 MiB per chunk
NCH = ROWS // CR         # 64 chunks
DT = jnp.float32


def _mat(out):
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def slope_time(fn_lo, fn_hi, args, k_lo, k_hi, reps=3):
    """Best-of-reps two-point slope: seconds per iteration."""
    _mat(fn_lo(*args)); _mat(fn_hi(*args))      # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); _mat(fn_lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _mat(fn_hi(*args))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
    return best


def diag_chunk(i0, cr=CR):
    """Generated affine diagonal for rows [i0, i0+cr) (no HBM stream).

    NB Mosaic requires INTEGER iota (f32 broadcasted_iota fails kernel
    verification); generate int32 and convert."""
    b = 999.0 / (N - 1)
    row = (jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 0).astype(DT)
           + jnp.asarray(i0, DT))
    lane = jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 1).astype(DT)
    return 1.0 + b * (row * 128.0 + lane)


# ------------------------------------------------------------------ XLA arms
def mk_xla(K, with_s):
    def diag_full():
        return diag_chunk(0, cr=ROWS)

    @jax.jit
    def run(r, p, x, s):
        def body(i, carry):
            r, p, s, acc = carry
            a = 1e-12 * acc
            pn = -r + a * p
            rn = r + a * (diag_full() * pn) + (a * a) * x
            if with_s:
                sn = s + a * pn
            else:
                sn = s
            return (rn, pn, sn, jnp.sum(rn * rn) + jnp.sum(x * rn))
        r, p, s, acc = jax.lax.fori_loop(
            0, K, body, (r, p, s, jnp.sum(r * r)))
        return acc
    return run


# --------------------------------------------------------------- Pallas arms
def mk_pallas(K, with_s):
    """Whole-loop kernel: x pinned in VMEM, r/p (+s) streamed in-place."""

    def kernel(r_hbm, p_hbm, x_hbm, s_hbm,
               r_out, p_out, s_out, acc_out):
        def scoped(x_vmem, rin, pin, sin, rob, pob, sob,
                   sem_in, sem_out, sem_x):
            # copy-in: r/p/s HBM->HBM into the (non-aliased) outputs the
            # loop then works on in-place; amortized over K iterations
            pltpu.make_async_copy(r_hbm, r_out, sem_in.at[0, 0]).start()
            pltpu.make_async_copy(p_hbm, p_out, sem_in.at[0, 1]).start()
            pltpu.make_async_copy(s_hbm, s_out, sem_in.at[0, 2]).start()
            cp = pltpu.make_async_copy(x_hbm, x_vmem, sem_x)
            cp.start()
            pltpu.make_async_copy(r_hbm, r_out, sem_in.at[0, 0]).wait()
            pltpu.make_async_copy(p_hbm, p_out, sem_in.at[0, 1]).wait()
            pltpu.make_async_copy(s_hbm, s_out, sem_in.at[0, 2]).wait()
            cp.wait()

            def read(i, slot):
                pltpu.make_async_copy(
                    r_out.at[pl.ds(i * CR, CR), :], rin.at[slot],
                    sem_in.at[slot, 0]).start()
                pltpu.make_async_copy(
                    p_out.at[pl.ds(i * CR, CR), :], pin.at[slot],
                    sem_in.at[slot, 1]).start()
                if with_s:
                    pltpu.make_async_copy(
                        s_out.at[pl.ds(i * CR, CR), :], sin.at[slot],
                        sem_in.at[slot, 2]).start()

            def wait_read(i, slot):
                pltpu.make_async_copy(
                    r_out.at[pl.ds(i * CR, CR), :], rin.at[slot],
                    sem_in.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    p_out.at[pl.ds(i * CR, CR), :], pin.at[slot],
                    sem_in.at[slot, 1]).wait()
                if with_s:
                    pltpu.make_async_copy(
                        s_out.at[pl.ds(i * CR, CR), :], sin.at[slot],
                        sem_in.at[slot, 2]).wait()

            def write(i, slot):
                pltpu.make_async_copy(
                    rob.at[slot], r_out.at[pl.ds(i * CR, CR), :],
                    sem_out.at[slot, 0]).start()
                pltpu.make_async_copy(
                    pob.at[slot], p_out.at[pl.ds(i * CR, CR), :],
                    sem_out.at[slot, 1]).start()
                if with_s:
                    pltpu.make_async_copy(
                        sob.at[slot], s_out.at[pl.ds(i * CR, CR), :],
                        sem_out.at[slot, 2]).start()

            def wait_write(i, slot):
                pltpu.make_async_copy(
                    rob.at[slot], r_out.at[pl.ds(i * CR, CR), :],
                    sem_out.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    pob.at[slot], p_out.at[pl.ds(i * CR, CR), :],
                    sem_out.at[slot, 1]).wait()
                if with_s:
                    pltpu.make_async_copy(
                        sob.at[slot], s_out.at[pl.ds(i * CR, CR), :],
                        sem_out.at[slot, 2]).wait()

            def iter_body(k, acc):
                a = 1e-12 * acc
                read(0, 0)

                def chunk(i, carry):
                    acc_i, pend = carry     # pend = chunk idx of oldest
                    slot = jax.lax.rem(i, 2)
                    nxt = jax.lax.rem(i + 1, 2)

                    @pl.when(i + 1 < NCH)
                    def _():
                        read(i + 1, nxt)

                    wait_read(i, slot)
                    rc = rin[slot]
                    pc = pin[slot]
                    xc = x_vmem[pl.ds(i * CR, CR), :]
                    d = diag_chunk(i * CR)
                    pn = -rc + a * pc
                    rn = rc + a * (d * pn) + (a * a) * xc

                    # before overwriting this slot's out buffers, drain the
                    # write issued from it two chunks ago
                    @pl.when(i >= 2)
                    def _():
                        wait_write(i - 2, slot)

                    rob[slot] = rn
                    pob[slot] = pn
                    if with_s:
                        sc = sin[slot]
                        sob[slot] = sc + a * pn
                    write(i, slot)
                    acc_i = acc_i + (jnp.sum(rn * rn) + jnp.sum(xc * rn))
                    return (acc_i, pend)

                acc2, _ = jax.lax.fori_loop(
                    0, NCH, chunk, (jnp.zeros((), DT), 0))
                # drain the last two writes so iteration k+1's reads see them
                wait_write(NCH - 2, 0)
                wait_write(NCH - 1, 1)
                return acc2

            acc = jax.lax.fori_loop(0, K, iter_body,
                                    jnp.ones((), DT))
            acc_out[0, 0] = acc

        n_arr = 3 if with_s else 2
        pl.run_scoped(
            scoped,
            pltpu.VMEM((ROWS, 128), DT),                 # x pinned (64 MiB)
            pltpu.VMEM((2, CR, 128), DT),                # r in 2 slots
            pltpu.VMEM((2, CR, 128), DT),                # p in
            pltpu.VMEM((2, CR, 128), DT),                # s in (unused if !s)
            pltpu.VMEM((2, CR, 128), DT),                # r out
            pltpu.VMEM((2, CR, 128), DT),                # p out
            pltpu.VMEM((2, CR, 128), DT),                # s out
            pltpu.SemaphoreType.DMA((2, 3)),             # in sems
            pltpu.SemaphoreType.DMA((2, 3)),             # out sems
            pltpu.SemaphoreType.DMA(()),                 # x sem
        )

    shp = jax.ShapeDtypeStruct((ROWS, 128), DT)

    @jax.jit
    def run(r, p, x, s):
        r2, p2, s2, acc = pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp,
                       jax.ShapeDtypeStruct((1, 1), DT)),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=TEST,
        )(r, p, x, s)
        return acc[0, 0]

    return run


def main():
    spec, kind = chip_bandwidth()
    print(f"device {kind}, spec {spec:.0f} GB/s, n=2^24 f32, "
          f"chunk {CR * 128 * 4 // 1024} KiB x {NCH}", flush=True)

    key = jax.random.PRNGKey(0)
    r = jax.random.uniform(key, (ROWS, 128), DT, 0.5, 1.0)
    p = jax.random.uniform(jax.random.PRNGKey(1), (ROWS, 128), DT, 0.5, 1.0)
    x = jax.random.uniform(jax.random.PRNGKey(2), (ROWS, 128), DT, 0.5, 1.0)
    s = jnp.zeros((ROWS, 128), DT)

    if TEST:
        for ws in (False, True):
            ax = float(mk_xla(3, with_s=ws)(r, p, x, s))
            ap = float(mk_pallas(3, with_s=ws)(r, p, x, s))
            ok = abs(ax - ap) <= 1e-5 * abs(ax)
            print(f"TEST with_s={ws}: xla={ax!r} pallas={ap!r} "
                  f"{'OK' if ok else 'MISMATCH'}")
        return

    K_LO, K_HI = 40, 400
    arms = [
        ("xla5 (r,p,x | r,p)", 5, functools.partial(mk_xla, with_s=False)),
        ("xla7 (s,r,p,x | s,r,p)", 7, functools.partial(mk_xla, with_s=True)),
        ("pal4 (r,p | r,p; x VMEM)", 4,
         functools.partial(mk_pallas, with_s=False)),
        ("pal6 (s,r,p | s,r,p; x VMEM)", 6,
         functools.partial(mk_pallas, with_s=True)),
    ]
    only = os.environ.get("PROBE_ARMS", "")
    if only:
        arms = [a for a in arms if a[0].split(" ")[0] in only.split(",")]
    for name, words, mk in arms:
        try:
            per_it = slope_time(mk(K_LO), mk(K_HI), (r, p, x, s), K_LO, K_HI)
        except Exception as e:
            print(f"{name:30s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        gbps = words * N * 4 / per_it / 1e9
        print(f"{name:30s} {gbps:7.1f} GB/s real ({gbps / spec:.2f} spec)  "
              f"{per_it * 1e3:7.3f} ms/iter -> {1.0 / per_it:7.1f} it/s",
              flush=True)


if __name__ == "__main__":
    main()
