"""Probe: can the streamed whole-loop Pallas kernel extend to GRAPH operators?

Round-5 measurement for VERDICT round 4 "missing 1/2" (the >VMEM streamed
tier serves only the elementwise+low-rank family; the reference streams
*any* user Hv, ``IterativeSolvers.h:294``).  A whole-loop kernel for the
rotation-sync / marginalized SE-Sync Hessians needs the connection
Laplacian inside the chunk loop: output row block i requires V at the
rows of i's graph NEIGHBORS — for production pose graphs (odometry chain
+ uniformly random loop closures, the config6 synthesis and every g2o
benchmark in the SE-Sync ecosystem) those rows are spread uniformly over
the whole vector.  A hand-DMA kernel can only fetch them at CHUNK
granularity (``pltpu.make_async_copy`` with dynamic slices; Mosaic has
no per-element HBM gather), so the question is quantitative:

  What does HBM DMA deliver at gather granularity g with RANDOM chunk
  offsets, vs the 659-660 GB/s contiguous-stream envelope the streamed
  CG kernel runs at (probe_pallas_stream.py)?  And what does XLA's own
  fused scatter/gather Laplacian apply already achieve on the same
  operator?

Arms (f32):

  ctg[g]    Pallas contiguous chunk stream at g rows/chunk (envelope
            at that granularity)
  rnd[g]    Pallas random-offset chunk DMA at g rows/chunk (an in-kernel
            LCG defeats any prefetch pattern) — the gather primitive any
            chunked graph kernel is built from
  xla_scatter / xla_adjacency
            the framework's connection-Laplacian apply
            (models/graph.laplacian_apply strategies) at n_rot = 2^21
            (= 1.9e7 variables, the >VMEM regime's operand scale),
            reported against the operator's honest data-movement floor
            (read V + write LV + per-edge neighbor-block traffic)

Edge locality of the production graph (host-side count, printed): with
the config6 synthesis (n-1 odometry edges + 2n random loop closures),
only the odometry third of the edges falls inside ANY chunk window —
bandwidth-reducing orderings cannot band uniformly random closures
(their expected |src - dst| is n/3), so ~2/3 of the edge traffic pays
the random-chunk rate no matter the ordering.

MEASURED VERDICT (TPU v5e, 2026-08-20, two-point-slope methodology):

  ctg[8]  134 GB/s   rnd[8]  134 GB/s     (4 KiB chunks)
  ctg[64] 476 GB/s   rnd[64] 468 GB/s     (32 KiB chunks)
  ctg[512] 633 GB/s  rnd[512] 574 GB/s    (256 KiB chunks)
  ctg[2048] 651 GB/s rnd[2048] 565 GB/s   (1 MiB chunks)
  xla_scatter 6.0 ms/apply = 102 GB/s of the 613 MB floor (0.12 of spec)
  xla_adjacency 3.2 ms/apply = 189 GB/s of the floor (0.23 of spec)

Conclusion — NEGATIVE, with numbers: random-chunk DMA only approaches
the streamed envelope at >= 256 KiB granularity, but a 256 KiB fetch to
serve one (3, 3) neighbor block is a ~7000x traffic amplification; at
the 4 KiB minimum-tile granularity the DMA engine delivers ~134 GB/s =
0.16 of spec, and a per-edge chunk fetch is still a ~100x amplification
(4096 B / 36 B useful).  For the production random-closure graphs
(~2/3 non-bandable edges), a chunked-gather kernel therefore moves
ORDERS OF MAGNITUDE more bytes than XLA's fused gather/scatter apply
already does — the kernel extension cannot beat the XLA path it would
replace.  The streamed whole-loop kernel stays the engine of the
elementwise + low-rank operator family (where it is 1.2-1.5x, configs
7/13); graph-operator subproblems stay on the XLA engines (flat_cg /
stpcg with the scatter-verdict apply strategies of models/graph.py).
What WOULD change the verdict: a hardware/Mosaic path for per-element
or sub-512 B gather DMA at stream rates, or genuinely banded problem
graphs (bandwidth << chunk rows after RCM — true for odometry-only
trajectories, false for every loop-closure dataset the reference
ecosystem benchmarks).
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

N = (1 << 15) if TEST else (1 << 26)     # gather-source vector (f32 words)
ROWS = N // 128
DT = jnp.float32
N_ROT = (1 << 8) if TEST else (1 << 21)  # rotation count for the XLA arms


def _mat(out):
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def slope_time(fn, args, k_lo, k_hi, reps=3):
    f_lo = functools.partial(fn, k_lo)
    f_hi = functools.partial(fn, k_hi)
    _mat(f_lo(*args)); _mat(f_hi(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); _mat(f_lo(*args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _mat(f_hi(*args))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
    return best


def mk_chunk_reader(gr: int, random_offsets: bool, n_fetch: int):
    """Kernel: ``n_fetch`` double-buffered (gr, 128) chunk DMAs from the
    HBM vector — contiguous or LCG-random offsets — accumulating a sum so
    nothing folds away.  Returns (1, 1) SMEM checksum."""
    nch = ROWS // gr

    def kernel(v_hbm, out_ref, buf, sem):
        zero = jnp.zeros((), jnp.float32)

        def off(t):
            if random_offsets:
                # 32-bit LCG -> [0, nch): defeats prefetch, reproducible
                h = (t * jnp.int32(1103515245) + jnp.int32(12345))
                return jnp.abs(h) % jnp.int32(nch)
            return t % jnp.int32(nch)

        def read(t, slot):
            return pltpu.make_async_copy(
                v_hbm.at[pl.ds(off(t) * gr, gr), :], buf.at[slot],
                sem.at[slot])

        read(jnp.int32(0), 0).start()

        def body(t, acc):
            slot = t % 2

            @pl.when(t + 1 < n_fetch)
            def _():
                read(t + 1, (t + 1) % 2).start()

            read(t, slot).wait()
            return acc + jnp.sum(buf[slot].astype(jnp.float32))

        acc = jax.lax.fori_loop(0, n_fetch, body, zero)
        out_ref[0, 0] = acc

    def run(v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((2, gr, 128), DT),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=4 * gr * 128 * 4 + 16 * 1024 * 1024),
            interpret=TEST,
        )(v)

    return run


def measure_dma(gr: int, random_offsets: bool, spec: float):
    v = jax.random.normal(jax.random.PRNGKey(0), (ROWS, 128), DT)
    k_lo = 2048 if not TEST else 8
    k_hi = 8192 if not TEST else 16

    def fn(k, vv):
        return mk_chunk_reader(gr, random_offsets, k)(vv)

    dt = slope_time(fn, (v,), k_lo, k_hi)
    gbps = gr * 128 * 4 / dt / 1e9
    tag = "rnd" if random_offsets else "ctg"
    print(f"{tag}[{gr}]: {dt * 1e6:.2f} us/chunk = {gbps:.0f} GB/s "
          f"({gbps / spec:.2f} of spec) at {gr * 128 * 4 / 1024:.0f} KiB "
          f"chunks", flush=True)
    return gbps


def measure_xla_laplacian(method: str, spec: float):
    """The framework's connection-Laplacian apply at n_rot = N_ROT, with
    the config6-style edge set (odometry chain + 2n random closures)."""
    import numpy as np
    from optimization_tpu.models import rotation_sync as rs

    n, d = N_ROT, 3
    rng = np.random.default_rng(0)
    extra = 2 * n
    src = np.concatenate([np.arange(n - 1), rng.integers(0, n, extra)])
    dst = np.concatenate([np.arange(1, n), rng.integers(0, n, extra)])
    keep = src != dst
    src = jnp.asarray(src[keep], jnp.int32)
    dst = jnp.asarray(dst[keep], jnp.int32)
    E = int(src.shape[0])
    # locality: fraction of edges within a 1 MiB chunk window (2048*128
    # f32 words / (d*d) = 29127 rotation indices)
    win = (2048 * 128) // (d * d)
    loc = float(np.mean(np.abs(np.asarray(src) - np.asarray(dst)) <= win))

    Mij = rs.ROTATIONS.rand(jax.random.PRNGKey(1), E, d, d).astype(DT)
    data = rs.RotationSyncData(src=src, dst=dst, Rij=Mij, kappa=None)
    L = rs.connection_laplacian_op(data, n, d, scatter_method=method)
    V = jax.random.normal(jax.random.PRNGKey(2), (n * d, d), DT)

    def chain(k, V0):
        def body(_, acc):
            return L(acc) * (1.0 / d)      # keep magnitudes bounded
        return jax.lax.fori_loop(0, k, body, V0)

    fn = jax.jit(chain, static_argnums=0)
    dt = slope_time(lambda k, vv: fn(k, vv), (V,), 4, 12)
    # honest data-movement floor per apply: read V + write LV + per-edge
    # traffic (gather both endpoint blocks + read M_e)
    floor = (2 * n * d * d + 3 * E * d * d) * 4
    gbps = floor / dt / 1e9
    print(f"xla_{method}: {dt * 1e3:.2f} ms/apply = {gbps:.0f} GB/s of the "
          f"{floor / 1e6:.0f} MB floor ({gbps / spec:.2f} of spec); "
          f"n={n} E={E}, {loc * 100:.0f}% of edges within a 1 MiB chunk "
          f"window", flush=True)
    return dt, gbps


def main():
    spec, kind = chip_bandwidth()
    print(f"# probe_graph_stream on {kind} (spec {spec:.0f} GB/s), "
          f"N={N} source words, n_rot={N_ROT}", flush=True)
    for gr in ([8, 64] if TEST else [8, 64, 512, 2048]):
        measure_dma(gr, False, spec)
        measure_dma(gr, True, spec)
    for method in ["scatter", "adjacency"]:
        try:
            measure_xla_laplacian(method, spec)
        except Exception as e:
            print(f"xla_{method} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
