"""VMEM-residency map: power chains across the VMEM boundary (real TPU).

XLA keeps a while-loop's carried arrays + loop invariants VMEM-resident
when they fit (~128 MiB on v5e), so a loop whose state fits moves NO HBM
bytes at all: "bandwidth" computed from streamed-traffic accounting is
apparent, not real.  Measured 2026-08-18 (two-point slopes, tunnel-
charge-free), raw = 2-array state, proj = 3-array (w in/out + x):

  n=2^20 (4 MiB/arr)   raw 1705 / proj 2200 GB/s apparent   RESIDENT
  n=2^22 (16 MiB/arr)  raw 3824 / proj 2836 GB/s apparent   RESIDENT
  n=2^24 (64 MiB/arr)  raw 2933 / proj 2501 GB/s apparent   RESIDENT
  n=2^25 (128 MiB/arr) raw  652 / proj  662 GB/s            STREAMED
  n=2^26 (256 MiB/arr) raw  701 / proj  672 GB/s            STREAMED

Consequences: (1) the BASELINE north-star Hv chain at its literal 10^6-
var size is not HBM-bound on this chip (benchmarks/config11 reports it
as apparent); (2) honest HBM streaming of the single-pass deferred-dot
projected Hv sustains 0.80-0.84 of spec — the >= 80%-of-roofline target
is met in the streamed regime; (3) the residency boundary tracks STATE
BYTES (bf16 at 2^25 is resident, f32 is not), so bf16 storage doubles
the problem size that rides VMEM.
"""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import jax
import jax.numpy as jnp
import numpy as np


def mat(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def best(fn, *args, reps=3):
    out = fn(*args); mat(out)
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(*args); mat(out)
        b = min(b, time.perf_counter() - t0)
    return b


def slope(mk, args, k_lo, k_hi):
    t_lo = best(mk(k_lo), *args)
    t_hi = best(mk(k_hi), *args)
    return (t_hi - t_lo) / (k_hi - k_lo)


print("backend", jax.default_backend(), flush=True)
for nl in (20, 22, 24, 25, 26):
    n = 1 << nl
    b = 999.0 / (n - 1)

    def diag():
        return 1.0 + b * jax.lax.iota(jnp.float32, n)

    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    x = x / jnp.linalg.norm(x)
    v0 = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)

    def mk_raw(K):
        @jax.jit
        def raw(v):
            def body(k, carry):
                w, s = carry
                c = jax.lax.rsqrt(s)
                y = (2.0 * c) * (diag() * w)
                return (y, jnp.sum(y * y))
            return jax.lax.fori_loop(0, K, body, (v, jnp.sum(v * v)))
        return raw

    rq = float(jnp.dot(x, 2.0 * (diag() * x)))

    def mk_proj(K):
        @jax.jit
        def proj(v, xx):
            def body(k, carry):
                w, s, e = carry
                c = jax.lax.rsqrt(s)
                dw = 2.0 * (diag() * w)
                wn = c * dw - (c * e) * xx - (rq * c) * w
                dwn = 2.0 * (diag() * wn)
                return (wn, jnp.sum(wn * wn), jnp.sum(xx * dwn))
            s0 = jnp.sum(v * v)
            e0 = jnp.sum(xx * (2.0 * (diag() * v)))
            return jax.lax.fori_loop(0, K, body, (v, s0, e0))
        return proj

    # scale K so device work is ~0.3-1 s in the HBM-bound regime
    k_hi = max(200, min(40000, int(3e9 / n)))
    k_lo = k_hi // 10
    pp_raw = slope(mk_raw, (v0,), k_lo, k_hi)
    pp_proj = slope(mk_proj, (v0, x), k_lo, k_hi)
    mb = 4 * n / (1 << 20)
    print(f"n=2^{nl} ({mb:.0f} MiB/array) K=({k_lo},{k_hi}): "
          f"raw {2 * 4 * n / pp_raw / 1e9:7.0f} GB/s app "
          f"({pp_raw * 1e6:8.1f} us/pass)   "
          f"proj {3 * 4 * n / pp_proj / 1e9:7.0f} GB/s app "
          f"({pp_proj * 1e6:8.1f} us/pass)", flush=True)
