"""Stream-pattern and CG-step-design probes (run on the real TPU).

Round-2 measurement harness for restructuring the STPCG hot loop: the
round-1 finding is that this runtime sustains ~860 GB/s on 2-stream XLA
fusions but only ~380-490 GB/s on 3-stream XLA or any Pallas grid.  This
script measures (a) the elementwise/reduction rates at every stream count
the redesigned CG step would use, and (b) assembled whole-CG-iteration
candidates, so the redesign is grounded in numbers rather than the
round-1 extrapolation.

Each probe chains K data-dependent passes inside one jit (dispatch is
~0.6 ms/call over the tunnel); nonlinear dependences (abs/maximum) keep
XLA from folding the chain.  Prints one human-readable line per probe.
"""

import sys
import time

import jax
import jax.numpy as jnp


def _materialize(out):
    """Force completion with a host transfer: block_until_ready can return
    early on the axon remote runtime (observed round 2)."""
    import numpy as _np
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            _np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)

N = 1 << 24
K = 30
REPS = 3
DT = jnp.float32


def timeit(fn, *args):
    out = fn(*args)
    _materialize(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _materialize(out)
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, words_per_pass, dt, k=K, extra=""):
    gbps = words_per_pass * 4 * k / dt / 1e9
    ms = dt / k * 1e3
    print(f"{name:34s} {gbps:8.1f} GB/s   {ms:7.3f} ms/pass  {extra}",
          flush=True)
    return gbps


def mk(key, shape=(N,)):
    return jax.random.uniform(jax.random.PRNGKey(key), shape, DT, 0.5, 1.0)


# Each probe body ends with a full reduction whose scalar result feeds the
# next iteration's elementwise update: XLA cannot fuse across the reduction,
# so every loop iteration is a genuine set of HBM passes.  (A first attempt
# with abs/maximum nonlinearities got unrolled and fused into ONE pass —
# 90 TB/s "bandwidth".)  The reduction itself fuses into the producing pass
# (multi-output fusion), so it adds no extra traffic.


# --------------------------------------------------------------- elementwise
def probe_elementwise():
    a, b, c, d2 = mk(0), mk(1), mk(2), mk(3)
    z0 = jnp.zeros((), DT)

    @jax.jit
    def ew2(u):  # read u, write u' : 2 streams, 2n words
        def body(i, carry):
            u, s = carry
            u = u + 1e-12 * s
            return (u, jnp.sum(u))
        return jax.lax.fori_loop(0, K, body, (u, z0))

    report("ew 2-stream (r1 w1)", 2 * N, timeit(ew2, a))

    @jax.jit
    def ew3(u, v):  # read u, v write u': 3 streams, 3n
        def body(i, carry):
            u, s = carry
            u = u + 1e-12 * s * v
            return (u, jnp.sum(u))
        return jax.lax.fori_loop(0, K, body, (u, z0))

    report("ew 3-stream (r2 w1)", 3 * N, timeit(ew3, a, b))

    @jax.jit
    def ew5(u, v, w):  # read u,v,w write u',v' : 5 streams, 5n
        def body(i, carry):
            u, v, s = carry
            u2 = u + 1e-12 * s * w
            v2 = v + 1e-12 * s * u
            return (u2, v2, jnp.sum(u2))
        return jax.lax.fori_loop(0, K, body, (u, v, z0))

    report("ew 5-stream (r3 w2)", 5 * N, timeit(ew5, a, b, c))

    @jax.jit
    def ew7(u, v, w, z):  # read 4 write 3: 7 streams, 7n
        def body(i, carry):
            u, v, w, s = carry
            u2 = u + 1e-12 * s * z
            v2 = v + 1e-12 * s * u
            w2 = w + 1e-12 * s * v
            return (u2, v2, w2, jnp.sum(u2))
        return jax.lax.fori_loop(0, K, body, (u, v, w, z0))

    report("ew 7-stream (r4 w3)", 7 * N, timeit(ew7, a, b, c, d2))


# ---------------------------------------------------------------- reductions
def probe_dots():
    a, b, c, d2 = mk(0), mk(1), mk(2), mk(3)
    z0 = jnp.zeros((), DT)

    @jax.jit
    def dots1(acc):
        def body(i, acc):
            ae = a + 1e-30 * acc            # scalar-dependent, still 1 read
            return 1e-30 * jnp.dot(ae, ae)
        return jax.lax.fori_loop(0, K, body, acc)

    report("dots 1-read (1 dot)", 1 * N, timeit(dots1, z0))

    @jax.jit
    def dots2(acc):
        def body(i, acc):
            ae = a + 1e-30 * acc
            return 1e-30 * (jnp.dot(ae, ae) + jnp.dot(ae, b) + jnp.dot(b, b))
        return jax.lax.fori_loop(0, K, body, acc)

    report("dots 2-read (3 dots)", 2 * N, timeit(dots2, z0))

    @jax.jit
    def dots3(acc):
        def body(i, acc):
            ae = a + 1e-30 * acc
            return 1e-30 * (jnp.dot(ae, ae) + jnp.dot(ae, b) + jnp.dot(ae, c)
                            + jnp.dot(b, b) + jnp.dot(b, c) + jnp.dot(c, c))
        return jax.lax.fori_loop(0, K, body, acc)

    report("dots 3-read (6 dots)", 3 * N, timeit(dots3, z0))

    @jax.jit
    def dots4(acc):
        def body(i, acc):
            ae = a + 1e-30 * acc
            t = 2.0 * d2 * ae               # generated stream (no HBM)
            return 1e-30 * (jnp.dot(ae, t) + jnp.dot(ae, b) + jnp.dot(ae, ae)
                            + jnp.dot(b, t) + jnp.dot(t, t) + jnp.dot(c, t)
                            + jnp.dot(c, b) + jnp.dot(c, ae) + jnp.dot(c, c))
        return jax.lax.fori_loop(0, K, body, acc)

    report("dots 4-read (9 dots, gen t)", 4 * N, timeit(dots4, z0))


# ----------------------------------------------------- interleaved state ops
def probe_interleaved():
    T = N // (8 * 128)
    X = mk(0, (T, 3, 8, 128))
    x = mk(1, (T, 8, 128))
    z0 = jnp.zeros((), DT)

    @jax.jit
    def inter_update(X):
        # one read stream (X), one write stream (X'): linear recombination
        def body(i, carry):
            X, sc = carry
            s = X[:, 0] + 1e-12 * sc * X[:, 2]
            r = X[:, 1] + 1e-12 * sc * X[:, 2]
            p = -X[:, 1] + 0.5 * X[:, 2]
            X = jnp.stack([s, r, p], axis=1)
            return (X, jnp.sum(r))
        return jax.lax.fori_loop(0, K, body, (X, z0))

    report("interleaved update (6n, 2str?)", 6 * N, timeit(inter_update, X))

    @jax.jit
    def inter_gram(acc):
        def body(i, acc):
            Xe = X + 1e-30 * acc
            p, r = Xe[:, 2], Xe[:, 1]
            t = 2.0 * p
            return 1e-30 * (jnp.vdot(p, t) + jnp.vdot(p, x) + jnp.vdot(p, p)
                            + jnp.vdot(x, t) + jnp.vdot(t, t) + jnp.vdot(r, p))
        return jax.lax.fori_loop(0, K, body, acc)

    report("interleaved gram (4n read)", 4 * N, timeit(inter_gram, z0))


# --------------------------------------------------------- CG-step candidates
def _dgen():
    # affine diagonal 1..1000 generated on the fly (no HBM stream)
    i = jax.lax.iota(DT, N)
    return 1.0 + (999.0 / (N - 1)) * i


def probe_cg_candidates():
    x = mk(7)
    x = x / jnp.sqrt(jnp.dot(x, x))
    g = mk(8)
    d_stored = _dgen() + 0.0   # materialized copy

    def run_cg(name, pass1, pass2, n_words, x=x, g=g):
        """Generic 2-pass CG skeleton; pass1/pass2 close over the operator."""
        @jax.jit
        def solve(g):
            # Symmetric SPD operator H v = 2 A v + (x'v) x + v: same stream
            # pattern and dot structure as the sphere Hessian (elementwise A,
            # one x-dot, one rank-1 term, one scalar*v term), but symmetric
            # on the whole space so CG runs its full course on random data.
            rq = jnp.asarray(-1.0, DT)

            def body(i, carry):
                s, r, p, rv, beta = carry
                p, scal = pass1(r, p, beta, x, rq)
                pt, px, pp, xt, tt, pr = scal
                kappa = pt + px * px - rq * pp
                alpha = rv / kappa
                s, r, rv_new = pass2(s, r, p, alpha, px, rq, x)
                beta = rv_new / (alpha * kappa)
                return (s, r, p, rv_new, beta)

            s0 = jnp.zeros_like(g)
            rv0 = jnp.dot(g, g)
            out = jax.lax.fori_loop(
                0, K, body, (s0, g, jnp.zeros_like(g), rv0,
                             jnp.zeros((), DT)))
            return out[0], out[3]

        dt = timeit(solve, g)
        report(name, n_words, dt, extra=f"(counted {n_words/N:.0f}n words)")

    # C1: separate arrays, generated diagonal
    def mk_passes(dvec):
        def op(p):
            return 2.0 * (dvec() * p)

        def pass1(r, p_prev, beta, x, rq):
            p = -r + beta * p_prev
            t = op(p)
            return p, (jnp.dot(p, t), jnp.dot(p, x), jnp.dot(p, p),
                       jnp.dot(x, t), jnp.dot(t, t), jnp.dot(p, r))

        def pass2(s, r, p, alpha, px, rq, x):
            t = op(p)
            Hp = t + px * x - rq * p
            s = s + alpha * p
            r = r + alpha * Hp
            return s, r, jnp.dot(r, r)

        return pass1, pass2

    p1, p2 = mk_passes(_dgen)
    # pass1: read r,p,x write p (4n) + pass2: read s,p,x,r... r was just
    # written... reads s,p,x + r, writes s,r (6n) -> 10n nominal
    run_cg("CG-C gen-diag 2-pass", p1, p2, 10 * N)

    p1s, p2s = mk_passes(lambda: d_stored)
    run_cg("CG-S stored-diag 2-pass", p1s, p2s, 12 * N)


def probe_cgcg():
    """Single-synchronization CG (Chronopoulos-Gear): one fused pass and ONE
    reduction group per iteration.  The deflated-operator dots for the next
    iteration expand into plain dots over (r', x, elementwise-of-r'), so
    beta/alpha/kappa all come from scalar recurrences.  H = 2A + xx' + I."""
    x = mk(7)
    x = x / jnp.sqrt(jnp.dot(x, x))
    g = mk(8)

    def dvec():
        i = jax.lax.iota(DT, N)
        return 1.0 + (999.0 / (N - 1)) * i

    def run(name, interleaved):
        @jax.jit
        def solve(g):
            d2 = 2.0 * dvec()

            # initial scalars: r0 = g; w0 = H r0
            rv0 = jnp.dot(g, g)
            t0 = d2 * g
            xr0 = jnp.dot(x, g)
            wr0 = jnp.dot(t0, g) + xr0 * xr0 + rv0

            if interleaved:
                T = N // (8 * 128)
                Xst = jnp.stack(
                    [jnp.zeros_like(g).reshape(T, 8, 128),
                     g.reshape(T, 8, 128),
                     jnp.zeros_like(g).reshape(T, 8, 128),
                     jnp.zeros_like(g).reshape(T, 8, 128)], axis=1)
                xs = x.reshape(T, 8, 128)
                d2s = d2.reshape(T, 8, 128)
            else:
                carry_vec = (jnp.zeros_like(g), g, jnp.zeros_like(g),
                             jnp.zeros_like(g))

            def body(i, carry):
                if interleaved:
                    Xc, rv, rv_prev, wr, xr, alpha_prev = carry
                    s, r, p, q = Xc[:, 0], Xc[:, 1], Xc[:, 2], Xc[:, 3]
                    xv, dv = xs, d2s
                else:
                    (s, r, p, q), rv, rv_prev, wr, xr, alpha_prev = carry
                    xv, dv = x, d2

                beta = jnp.where(rv_prev > 0, rv / rv_prev, 0.0)
                denom = wr - (beta / jnp.where(alpha_prev > 0, alpha_prev,
                                               1.0)) * rv * (beta > 0)
                alpha = rv / denom

                w = dv * r + xr * xv + r
                p2 = r + beta * p
                q2 = w + beta * q
                s2 = s + alpha * p2
                r2 = r - alpha * q2

                t2 = dv * r2
                rv2 = jnp.sum(r2 * r2)
                xr2 = jnp.sum(xv * r2)
                tr2 = jnp.sum(t2 * r2)
                wr2 = tr2 + xr2 * xr2 + rv2

                if interleaved:
                    Xc2 = jnp.stack([s2, r2, p2, q2], axis=1)
                    return (Xc2, rv2, rv, wr2, xr2, alpha)
                return ((s2, r2, p2, q2), rv2, rv, wr2, xr2, alpha)

            if interleaved:
                init = (Xst, rv0, jnp.zeros((), DT), wr0, xr0,
                        jnp.zeros((), DT))
            else:
                init = (carry_vec, rv0, jnp.zeros((), DT), wr0, xr0,
                        jnp.zeros((), DT))
            out = jax.lax.fori_loop(0, K, body, init)
            return out[1]

        dt = timeit(solve, g)
        report(name, 9 * N, dt, extra="(9n counted, 1 sync group)")

    run("CGCG separate arrays", False)
    run("CGCG interleaved state", True)


def probe_stpcg_variants():
    sys.path.insert(0, "/root/repo")
    from optimization_tpu.linalg.stpcg import stpcg

    x = mk(7)
    x = x / jnp.sqrt(jnp.dot(x, x))
    g0 = mk(8)
    d_stored = _dgen() + 0.0

    def run(name, Hv, g0=g0):
        @jax.jit
        def solve(g):
            res = stpcg(g, Hv, lambda u, v: jnp.dot(u, v), 1e9,
                        max_iterations=K, kappa_fgr=1e-6, theta=1.0)
            return res.s, res.num_iterations

        s, it = solve(g0)
        _materialize(s)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            s, it = solve(g0)
            _materialize(s)
            best = min(best, time.perf_counter() - t0)
        iters = int(it)
        print(f"{name:34s} {best / max(iters, 1) * 1e3:7.3f} ms/iter "
              f"({iters} iters)", flush=True)

    # Symmetric SPD with the sphere-Hessian stream pattern (see
    # probe_cg_candidates): H v = 2 A v + (x'v) x + v.
    def Hv_gen(v):
        t = 2.0 * (_dgen() * v)
        return t + jnp.dot(x, v) * x + v

    def Hv_stored(v):
        t = 2.0 * (d_stored * v)
        return t + jnp.dot(x, v) * x + v

    run("stpcg XLA gen-diag", Hv_gen)
    run("stpcg XLA stored-diag", Hv_stored)

    from optimization_tpu.kernels import diag_stencil_matvec

    def Hv_pallas(v):
        t = 2.0 * diag_stencil_matvec(d_stored, v)
        return t + jnp.dot(x, v) * x + v

    run("stpcg Pallas stencil (r1 base)", Hv_pallas)


SECTIONS = {
    "ew": probe_elementwise,
    "dots": probe_dots,
    "inter": probe_interleaved,
    "cg": probe_cg_candidates,
    "cgcg": probe_cgcg,
    "stpcg": probe_stpcg_variants,
}

if __name__ == "__main__":
    print(f"backend={jax.default_backend()} n=2^24 K={K}", flush=True)
    which = sys.argv[1:] or list(SECTIONS)
    for name in which:
        SECTIONS[name]()
