"""Config 11: Hessian-vector-product throughput vs the HBM roofline.

The BASELINE north star's literal single-chip metric (BASELINE.md:37):
sustained Hv matvec throughput on a >=10^6-variable Riemannian TNT problem,
target >= 80% of the per-chip HBM roofline.  This config measures the
flagship sphere Rayleigh-quotient Hessian application — the exact operator
TNT's inner CG applies at a fixed outer iterate (reference seam
``TNT.h:489-492`` / the ``quadratic_model`` Hv of bench.py) — in a
power-iteration chain ``v <- Hv / ||Hv||``: every pass ends in a full
reduction whose scalar feeds the next pass, so XLA can neither fold nor
batch the chain and the measured rate is the honest streaming rate
(methodology validated in benchmarks/probe_streams.py).

Variants (all at n = 2^24, the headline scale; a 2^20 ~ 10^6-var line is
also printed for the north star's literal size):

- ``raw``: the operator pass ``y = 2 A v`` with the diagonal generated on
  the fly — 2 HBM streams (read v, write y), the bytes carrier all other
  passes add streams to;
- ``proj_f32``: the full projected tangent Hv
  ``P_x(2Av) - <x, 2Ax> v`` in f32 — 3 streams (read v, read x, write);
- ``proj_bf16``: the same with bf16 iterate storage / f32 accumulation
  (the headline tier of bench.py): 3 streams at half the bytes.

Real-bytes bandwidth accounting (bytes actually moved per pass / wall
time); "fraction" = that bandwidth over the chip's spec HBM bandwidth.

Headline value: the best projected-Hv fraction of spec.
vs_baseline = fraction / 0.80 (>= 1.0 meets the north star).
"""

import jax
import jax.numpy as jnp

from _util import best_time, chip_bandwidth, emit

K_BY_N = {1 << 24: 30, 1 << 20: 400}   # chained passes per timed call
# (scaled so each timed call runs >= ~10 ms: at n=2^20 a pass is ~25 us
#  and a 30-pass chain would be dispatch-dominated)


def _variants(n, K):
    b = 999.0 / (n - 1)

    def diag():
        return 1.0 + b * jax.lax.iota(jnp.float32, n)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n,), jnp.float32)
    x = x / jnp.linalg.norm(x)
    v0 = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
    rq = float(jnp.dot(x, 2.0 * (diag() * x)))

    @jax.jit
    def raw(v):
        def body(k, carry):
            v, _ = carry
            y = 2.0 * (diag() * v)
            s = jnp.sum(y * y)
            return (y * jax.lax.rsqrt(s), s)
        return jax.lax.fori_loop(0, K, body, (v, jnp.zeros((), jnp.float32)))

    @jax.jit
    def proj_f32(v, x):
        def body(k, carry):
            v, _ = carry
            av2 = 2.0 * (diag() * v)
            t = av2 - x * jnp.dot(x, av2)
            w = t - rq * v
            s = jnp.sum(w * w)
            return (w * jax.lax.rsqrt(s), s)
        return jax.lax.fori_loop(0, K, body, (v, jnp.zeros((), jnp.float32)))

    @jax.jit
    def proj_bf16(v, x):
        # bf16 storage, every product/reduction accumulates f32 (bench.py
        # headline tier contract).
        def body(k, carry):
            v, _ = carry
            vf = v.astype(jnp.float32)
            xf = x.astype(jnp.float32)
            av2 = 2.0 * (diag() * vf)
            t = av2 - xf * jnp.dot(xf, av2)
            w = t - rq * vf
            s = jnp.sum(w * w)
            return ((w * jax.lax.rsqrt(s)).astype(jnp.bfloat16), s)
        return jax.lax.fori_loop(0, K, body,
                                 (v, jnp.zeros((), jnp.float32)))

    return [
        ("raw", raw, (v0,), 2 * 4 * n),
        ("proj_f32", proj_f32, (v0, x), 3 * 4 * n),
        ("proj_bf16", proj_bf16,
         (v0.astype(jnp.bfloat16), x.astype(jnp.bfloat16)), 3 * 2 * n),
    ]


def main():
    spec, kind = chip_bandwidth()
    lines = [kind]
    best_proj = 0.0
    for n, tag in [(1 << 24, "2^24"), (1 << 20, "2^20")]:
        K = K_BY_N[n]
        for name, fn, args, bytes_per_pass in _variants(n, K):
            dt = best_time(fn, *args)
            gbps = bytes_per_pass * K / dt / 1e9
            frac = gbps / spec
            lines.append(f"{tag}/{name} {gbps:.0f} GB/s ({frac:.2f} spec)")
            if name.startswith("proj") and tag == "2^24":
                best_proj = max(best_proj, frac)
    emit("hv_matvec_fraction_of_spec_hbm", best_proj,
         "projected sphere Hv power-iteration chain, real-bytes BW: "
         + "; ".join(lines) + f"; spec {spec:.0f} GB/s",
         best_proj / 0.80)


if __name__ == "__main__":
    main()
