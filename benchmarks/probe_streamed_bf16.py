"""Probe: the streamed kernel in the bf16 >VMEM regime (n = 2^26).

config7's tier: bf16 storage / f32 accumulate at n = 2^26, where even
bf16 state streams from HBM (s/r/p/x = 512 MiB) AND x alone (128 MiB)
exceeds the kernel's VMEM pin budget — so this exercises the round-4
streamed-x mode: x is DMA'd chunk-wise alongside r/p.

Words per CG iteration (bf16 = 2 bytes):
  pallas-pair, streamed-x: defer 5n (r,p,x in; r,p out) / apply 7n -> 6n
  xla bodies:              ~7n (pair body + x re-read)

Methodology: two-point slope over actual iteration counts (see
probe_streamed_kernel.py).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from _util import chip_bandwidth  # noqa: E402

N = 1 << 26
DT = jnp.bfloat16


def _mat(out):
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def main():
    spec, kind = chip_bandwidth()
    print(f"device {kind}, spec {spec:.0f} GB/s, bf16 n=2^26", flush=True)

    b = 99999.0 / (N - 1)

    def a_chunk(i0, aux, cr=2048):
        row = (jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 0)
               .astype(jnp.float32) + jnp.asarray(i0, jnp.float32))
        lane = jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 1).astype(
            jnp.float32)
        return 1.0 + jnp.asarray(b, jnp.float32) * (row * 128.0 + lane)

    def A_elem(v):
        i = jax.lax.iota(jnp.float32, N)
        return ((1.0 + b * i) * v.astype(jnp.float32))

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N,), jnp.float32)
    x = (x / jnp.linalg.norm(x)).astype(DT)
    g = jax.random.normal(jax.random.PRNGKey(1), (N,), jnp.float32)
    g = (g / jnp.linalg.norm(g)).astype(DT)
    rq_pd = jnp.asarray(0.5, jnp.float32)
    xs = 2.0 * A_elem(x)
    s2 = 1.0 / float(jnp.dot(xs, xs))
    B_pd = jnp.asarray([[1.0, 0.0], [0.0, s2]], jnp.float32)

    from optimization_tpu.kernels.streamed_cg import (
        sphere_rayleigh_streamed, stpcg_flat_streamed)
    from optimization_tpu.linalg.flat_cg import stpcg_flat

    a0c, weights, _ = sphere_rayleigh_streamed(a_chunk)
    A0 = lambda v: 2.0 * A_elem(v) - rq_pd * v.astype(jnp.float32)
    U = (x, (x, lambda v: 2.0 * A_elem(v)))

    K_LO, K_HI = 40, 240
    KAPPA = 1e-12

    def run_stream(K):
        @jax.jit
        def f(gg):
            return stpcg_flat_streamed(
                gg, x, B_pd, 1e9, aux_scalars=(rq_pd,), a0_chunk=a0c,
                weights=weights, max_iterations=K, kappa_fgr=KAPPA,
                theta=0.0)
        return f

    def run_xla(K, body):
        @jax.jit
        def f(gg):
            return stpcg_flat(gg, A0, U, B_pd, 1e9, max_iterations=K,
                              kappa_fgr=KAPPA, theta=0.0, body_kind=body)
        return f

    arms = [("pallas-pair-xstream 6n", run_stream, 6),
            ("xla-pair 7n", lambda K: run_xla(K, "pair"), 7),
            ("xla-single 7n", lambda K: run_xla(K, "single"), 7)]
    only = os.environ.get("PROBE_ARMS", "")
    if only:
        arms = [a for a in arms if a[0].split(" ")[0] in only.split(",")]

    for name, mk, words in arms:
        try:
            flo, fhi = mk(K_LO), mk(K_HI)
            rlo = flo(g)
            _mat(rlo)
            rhi = fhi(g)
            _mat(rhi)
            it_lo, it_hi = (int(rlo.num_iterations),
                            int(rhi.num_iterations))
            if it_hi - it_lo < (K_HI - K_LO) // 2:
                print(f"{name:24s} DEGENERATE: ran {it_lo}/{it_hi}",
                      flush=True)
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); _mat(flo(g))
                tl = time.perf_counter() - t0
                t0 = time.perf_counter(); _mat(fhi(g))
                th = time.perf_counter() - t0
                best = min(best, (th - tl) / (it_hi - it_lo))
            gbps = words * N * 2 / best / 1e9
            print(f"{name:24s} {1.0 / best:7.1f} it/s  {gbps:6.1f} GB/s "
                  f"real ({gbps / spec:.2f} spec)  [ran {it_lo}/{it_hi}]",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
