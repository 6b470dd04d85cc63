"""Streamed whole-loop Pallas CG kernel == the flat/generic engines.

Runs the kernel in Pallas interpret mode on CPU (semantics only; the
bandwidth story is measured on hardware by
``benchmarks/probe_pallas_stream.py`` / bench.py).  Parity targets: the
flat pair engine's single body (``linalg/flat_cg``) and the generic
``stpcg`` across interior/truncation, trust-region-boundary, and
negative-curvature regimes on the sphere Rayleigh-quotient structure
(reference STPCG contract, ``IterativeSolvers.h:166-426``).

NB interpret-mode caveat: the kernel is f32 (its production dtype), so
comparisons against the x64 engines use f32-appropriate tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_tpu.kernels.streamed_cg import (sphere_rayleigh_streamed,
                                                  stpcg_flat_streamed)
from optimization_tpu.linalg.flat_cg import sphere_rayleigh_flat, stpcg_flat

CR = 16
N = 4 * CR * 128            # 4 chunks of (16, 128)


def _setup(seed=0, spread=25.0):
    b = spread / (N - 1)

    def a_chunk(i0, aux):
        row = (jax.lax.broadcasted_iota(jnp.int32, (CR, 128), 0)
               .astype(jnp.float32) + jnp.float32(i0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (CR, 128), 1).astype(
            jnp.float32)
        return 1.0 + jnp.float32(b) * (row * 128.0 + lane)

    def A_elem(v):
        i = jnp.arange(N, dtype=jnp.float32)
        return ((1.0 + jnp.float32(b) * i) * v).astype(jnp.float32)

    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (N,), jnp.float32)
    x = x / jnp.linalg.norm(x)
    y = 2.0 * A_elem(x)
    rq = jnp.float32(jnp.dot(x, y))
    g = (y - rq * x).astype(jnp.float32)        # tangent gradient
    return a_chunk, A_elem, x, rq, g


def _run_streamed(a_chunk, x, rq, g, Delta, body="pair", **kw):
    a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)
    return stpcg_flat_streamed(
        g, x, B_fn(rq), Delta, aux_scalars=(rq,),
        a0_chunk=a0c, weights=weights, chunk_rows=CR, interpret=True,
        body_kind=body, **kw)


def _run_flat(A_elem, x, rq, g, Delta, **kw):
    A0, U, B, _ = sphere_rayleigh_flat(x, A_elem, rq=rq)
    return stpcg_flat(g, A0, U, B, Delta, body_kind="single", **kw)


@pytest.mark.parametrize("body", ["single", "pair"])
@pytest.mark.parametrize("Delta", [1e6, 0.5, 0.02])
def test_matches_flat_engine(Delta, body):
    a_chunk, A_elem, x, rq, g = _setup()
    ref = _run_flat(A_elem, x, rq, g, Delta, max_iterations=300,
                    kappa_fgr=0.05, theta=0.5)
    res = _run_streamed(a_chunk, x, rq, g, Delta, body=body,
                        max_iterations=300,
                        kappa_fgr=0.05, theta=0.5)
    assert int(res.num_iterations) == int(ref.num_iterations), Delta
    np.testing.assert_allclose(float(res.update_step_M_norm),
                               float(ref.update_step_M_norm), rtol=2e-5)
    scale = max(float(jnp.linalg.norm(ref.s)), 1e-9)
    np.testing.assert_allclose(np.asarray(res.s), np.asarray(ref.s),
                               atol=3e-5 * scale)
    # f32 boundary steps at Delta=1e6 assemble mval from ~1e12-scale
    # cancellations; 2e-3 relative is the f32 envelope there
    np.testing.assert_allclose(float(res.predicted_decrease),
                               float(ref.predicted_decrease),
                               rtol=2e-3, atol=1e-8)


@pytest.mark.parametrize("body", ["single", "pair"])
@pytest.mark.parametrize("Delta", [1e6, 2.0])
def test_interior_multi_iteration_parity(Delta, body):
    """Many interior CG iterations (genuinely PD operator: PSD low-rank
    coupling): the carried reduction-group recurrences must track the flat
    engine.  NB f32 parity here is CONTRACT parity, not bitwise trajectory
    parity — the kernel's chunked dot accumulation differs from XLA's at
    the ulp level and CG amplifies it, so the two valid solves may differ
    by one iteration at the truncation threshold; both must satisfy the
    truncation contract and land close."""
    a_chunk, A_elem, x, _rq, g = _setup(seed=7)
    rq_pd = jnp.float32(0.5)
    a0c, weights, _B = sphere_rayleigh_streamed(a_chunk)
    B_pd = jnp.asarray([[1.0, 0.2], [0.2, 0.5]], jnp.float32)
    kappa = 1e-3
    res = stpcg_flat_streamed(
        g, x, B_pd, Delta, aux_scalars=(rq_pd,), a0_chunk=a0c,
        weights=weights, chunk_rows=CR, interpret=True, body_kind=body,
        max_iterations=400, kappa_fgr=kappa, theta=0.9)
    A0 = lambda v: 2.0 * A_elem(v) - rq_pd * v
    U = (x, (x, lambda v: 2.0 * A_elem(v)))
    ref = stpcg_flat(g, A0, U, B_pd, Delta, body_kind="single",
                     max_iterations=400, kappa_fgr=kappa, theta=0.9)
    assert abs(int(res.num_iterations) - int(ref.num_iterations)) <= 1
    assert int(res.num_iterations) > 3      # genuinely multi-iteration
    # (Delta=2 exits on the TR boundary after 4 interior steps)
    np.testing.assert_allclose(float(res.update_step_M_norm),
                               float(ref.update_step_M_norm), rtol=1e-3)
    scale = max(float(jnp.linalg.norm(ref.s)), 1e-9)
    np.testing.assert_allclose(np.asarray(res.s), np.asarray(ref.s),
                               atol=2e-3 * scale)
    np.testing.assert_allclose(float(res.predicted_decrease),
                               float(ref.predicted_decrease), rtol=1e-3)
    if Delta > 10.0:                         # interior truncation exit
        Um = jnp.stack([x, 2.0 * A_elem(x)], axis=1)
        for s in (res.s, ref.s):
            r = np.asarray(A0(s) + Um @ (B_pd @ (Um.T @ s)) + g)
            assert (np.linalg.norm(r)
                    < kappa * float(jnp.linalg.norm(g)) * 1.6)


def test_negative_curvature_boundary():
    """The sphere Hessian 2A - rq I is indefinite whenever rq exceeds the
    smallest diagonal — CG must exit on the boundary with |s| = Delta."""
    a_chunk, A_elem, x, rq, g = _setup(seed=3, spread=200.0)
    Delta = 5.0
    ref = _run_flat(A_elem, x, rq, g, Delta, max_iterations=500,
                    kappa_fgr=1e-8, theta=0.999)
    for body in ("single", "pair"):
        res = _run_streamed(a_chunk, x, rq, g, Delta, body=body,
                            max_iterations=500,
                            kappa_fgr=1e-8, theta=0.999)
        np.testing.assert_allclose(float(res.update_step_M_norm), Delta,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(jnp.linalg.norm(res.s)), Delta,
                                   rtol=1e-4)
        assert int(res.num_iterations) == int(ref.num_iterations)
        scale = max(float(jnp.linalg.norm(ref.s)), 1e-9)
        np.testing.assert_allclose(np.asarray(res.s), np.asarray(ref.s),
                                   atol=5e-4 * scale)


def test_truncation_contract():
    """|H s + g| < kappa |g| on interior truncation exits — the reference's
    guaranteed relative residual reduction (IterativeSolvers.h:275-291).

    The TRUE sphere Hessian at a random point is indefinite (2a - rq
    changes sign), which exits at the boundary instead — so this test runs
    the kernel's operator contract with a SHIFTED scalar rq_pd below
    2 min(a), making A0 = 2A - rq_pd I positive definite (the kernel is
    agnostic to where the aux scalars come from)."""
    a_chunk, A_elem, x, rq, g = _setup(seed=5)
    rq_pd = jnp.float32(0.5)
    kappa = 0.1
    a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)
    res = stpcg_flat_streamed(
        g, x, B_fn(rq_pd), 1e6, aux_scalars=(rq_pd,), a0_chunk=a0c,
        weights=weights, chunk_rows=CR, interpret=True,
        max_iterations=1000, kappa_fgr=kappa, theta=0.5)
    assert int(res.num_iterations) > 0
    A0, U, B, _ = sphere_rayleigh_flat(x, A_elem, rq=rq_pd)
    Um = jnp.stack([U[0], 2.0 * A_elem(U[1][0])], axis=1)
    Hs = A0(res.s) + Um @ (jnp.asarray(B) @ (Um.T @ res.s))
    r = np.asarray(Hs + g)
    assert np.linalg.norm(r) < kappa * float(jnp.linalg.norm(g)) * 1.05


def test_shape_validation():
    a_chunk, A_elem, x, rq, g = _setup()
    a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)
    with pytest.raises(ValueError):
        stpcg_flat_streamed(g[:-128], x[:-128], B_fn(rq), 1.0,
                            aux_scalars=(rq,), a0_chunk=a0c,
                            weights=weights, chunk_rows=CR, interpret=True)
    with pytest.raises(ValueError):
        stpcg_flat_streamed(g.astype(jnp.float64), x, B_fn(rq), 1.0,
                            aux_scalars=(rq,), a0_chunk=a0c,
                            weights=weights, chunk_rows=CR, interpret=True)


def test_tnt_flat_solve_streamed_matches_flat_qm():
    """TNT with problem.flat_solve (the streamed kernel in interpret mode)
    reaches the same optimum as the flat_qm path on the small Rayleigh
    config (the bench.py f32-tier wiring, CPU-validated)."""
    from optimization_tpu import RiemannianProblem
    from optimization_tpu.linalg.flat_cg import sphere_rayleigh_step
    from optimization_tpu.manifolds import sphere
    from optimization_tpu.solvers import tnt

    n, cr = N, CR
    b = 999.0 / (n - 1)
    M = sphere()

    def A_elem(v):
        i = jnp.arange(n, dtype=jnp.float32)
        return ((1.0 + jnp.float32(b) * i) * v.astype(jnp.float32))

    def a_chunk(i0, aux):
        row = (jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 0)
               .astype(jnp.float32) + jnp.float32(i0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 1).astype(
            jnp.float32)
        return 1.0 + jnp.float32(b) * (row * 128.0 + lane)

    f = lambda x, dd: jnp.dot(x.astype(jnp.float32), A_elem(x))
    grad = lambda x, dd: M.proj(x, (2.0 * A_elem(x)).astype(x.dtype))

    def flat_qm(x, dd, aux=None):
        rq = aux.rq if aux is not None else None
        A0, U, B, _ = sphere_rayleigh_flat(x, A_elem, rq=rq)
        return A0, U, B, (aux.init if aux is not None else None)

    a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)

    def flat_solve(g, x, dd, aux, Delta, params):
        return stpcg_flat_streamed(
            g, x, B_fn(aux.rq), Delta, aux_scalars=(aux.rq,),
            a0_chunk=a0c, weights=weights, chunk_rows=cr, interpret=True,
            max_iterations=params.max_TPCG_iterations,
            kappa_fgr=params.kappa_fgr, theta=params.theta)

    params = tnt.TNTParams(
        max_iterations=40, max_TPCG_iterations=40, gradient_tolerance=1e-3,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0)
    x0 = M.rand(jax.random.PRNGKey(5), n).astype(jnp.float32)
    se = sphere_rayleigh_step(A_elem)

    r_stream = tnt.solve(RiemannianProblem(
        f=f, manifold=M, grad=grad, flat_qm=flat_qm, flat_solve=flat_solve,
        step_eval=se), x0, params)
    r_flat = tnt.solve(RiemannianProblem(
        f=f, manifold=M, grad=grad, flat_qm=flat_qm, step_eval=se),
        x0, params)

    np.testing.assert_allclose(float(r_stream.f), 1.0, atol=5e-3)
    np.testing.assert_allclose(float(r_stream.f), float(r_flat.f),
                               rtol=5e-4)
    assert abs(int(r_stream.num_iterations)
               - int(r_flat.num_iterations)) <= 3


@pytest.mark.parametrize("pin", [True, False])
def test_bf16_storage_parity(pin):
    """bf16 storage / f32 accumulate, both x modes (pinned VMEM and
    streamed-x — the latter is mandatory once x outgrows the pin budget:
    f32 n >= 2^25, bf16 n >= 2^26)."""
    a_chunk, A_elem, x, _rq, g = _setup(seed=9)
    rq_pd = jnp.float32(0.5)
    a0c, weights, _ = sphere_rayleigh_streamed(a_chunk)
    B_pd = jnp.asarray([[1.0, 0.2], [0.2, 0.5]], jnp.float32)
    xb = x.astype(jnp.bfloat16)
    gb = g.astype(jnp.bfloat16)
    # NB a huge Delta is a knife-edge in bf16: once CG stalls at the
    # storage floor, a rounding-sign kappa <= 0 fires a sigma-step to the
    # boundary and |s| jumps to Delta — both engines stall validly but
    # not identically.  A tame Delta keeps the exit bounded and
    # comparable.
    Delta = 1.0
    res = stpcg_flat_streamed(
        gb, xb, B_pd, Delta, aux_scalars=(rq_pd,), a0_chunk=a0c,
        weights=weights, chunk_rows=CR, interpret=True, pin_x=pin,
        max_iterations=200, kappa_fgr=1e-2, theta=0.9)
    assert res.s.dtype == jnp.bfloat16
    # reference: the flat engine on the same bf16 inputs
    A0 = lambda v: 2.0 * A_elem(v) - rq_pd * v.astype(jnp.float32)
    U = (xb, (xb, lambda v: 2.0 * A_elem(v)))
    ref = stpcg_flat(gb, A0, U, B_pd, Delta, body_kind="single",
                     max_iterations=200, kappa_fgr=1e-2, theta=0.9)
    assert abs(int(res.num_iterations) - int(ref.num_iterations)) <= 3
    scale = max(float(jnp.linalg.norm(ref.s.astype(jnp.float32))), 1e-9)
    np.testing.assert_allclose(
        np.asarray(res.s, np.float32), np.asarray(ref.s, np.float32),
        atol=3e-2 * scale)


def test_streamed_x_mode_matches_pinned_f32():
    """pin_x=False must be numerically identical to pinned mode (same
    arithmetic, different data movement)."""
    a_chunk, A_elem, x, rq, g = _setup(seed=11)
    kw = dict(max_iterations=120, kappa_fgr=1e-2, theta=0.5)
    a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)
    r_pin = stpcg_flat_streamed(
        g, x, B_fn(rq), 1.0, aux_scalars=(rq,), a0_chunk=a0c,
        weights=weights, chunk_rows=CR, interpret=True, pin_x=True, **kw)
    r_str = stpcg_flat_streamed(
        g, x, B_fn(rq), 1.0, aux_scalars=(rq,), a0_chunk=a0c,
        weights=weights, chunk_rows=CR, interpret=True, pin_x=False, **kw)
    assert int(r_pin.num_iterations) == int(r_str.num_iterations)
    np.testing.assert_array_equal(np.asarray(r_pin.s), np.asarray(r_str.s))
    np.testing.assert_array_equal(float(r_pin.update_step_M_norm),
                                  float(r_str.update_step_M_norm))


# ------------------------------------------------ preconditioning (r5) --

def _jacobi_prec(rq_like, spread):
    """The elementwise Jacobi M^{-1/2} for A0 = 2A - rq I in BOTH forms the
    streamed kernel needs (chunk generator + whole-array apply), regularized
    to stay positive on indefinite fixtures."""
    b = spread / (N - 1)

    def prec_chunk(i0, aux):
        row = (jax.lax.broadcasted_iota(jnp.int32, (CR, 128), 0)
               .astype(jnp.float32) + jnp.float32(i0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (CR, 128), 1).astype(
            jnp.float32)
        a = 1.0 + jnp.float32(b) * (row * 128.0 + lane)
        return jax.lax.rsqrt(jnp.abs(2.0 * a - aux[0]) + 1.0)

    def prec_full(v):
        a = 1.0 + jnp.float32(b) * jnp.arange(N, dtype=jnp.float32)
        return v * jax.lax.rsqrt(jnp.abs(2.0 * a - rq_like) + 1.0)

    return prec_chunk, prec_full


@pytest.mark.parametrize("body", ["single", "pair"])
@pytest.mark.parametrize("Delta", [1e6, 0.5, 0.02])
def test_prec_matches_xla_prec_engine(Delta, body):
    """stpcg_flat_streamed(prec_chunk=, prec=) == stpcg_flat(prec=) across
    interior-truncation / TR-boundary / tiny-Delta regimes — the
    hot-loop-native preconditioned STPCG contract
    (IterativeSolvers.h:236-252,388-420) in the streamed kernel
    (VERDICT round 4, missing 2)."""
    a_chunk, A_elem, x, rq, g = _setup(seed=2)
    prec_chunk, prec_full = _jacobi_prec(rq, 25.0)
    a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)
    res = stpcg_flat_streamed(
        g, x, B_fn(rq), Delta, aux_scalars=(rq,), a0_chunk=a0c,
        weights=weights, chunk_rows=CR, interpret=True, body_kind=body,
        prec_chunk=prec_chunk, prec=prec_full,
        max_iterations=300, kappa_fgr=0.05, theta=0.5)
    A0, U, B, _ = sphere_rayleigh_flat(x, A_elem, rq=rq)
    ref = stpcg_flat(g, A0, U, B, Delta, body_kind="single",
                     max_iterations=300, kappa_fgr=0.05, theta=0.5,
                     prec=prec_full)
    assert abs(int(res.num_iterations) - int(ref.num_iterations)) <= 1, Delta
    np.testing.assert_allclose(float(res.update_step_M_norm),
                               float(ref.update_step_M_norm), rtol=2e-4)
    scale = max(float(jnp.linalg.norm(ref.s)), 1e-9)
    np.testing.assert_allclose(np.asarray(res.s), np.asarray(ref.s),
                               atol=3e-4 * scale)
    np.testing.assert_allclose(float(res.predicted_decrease),
                               float(ref.predicted_decrease),
                               rtol=2e-3, atol=1e-8)


def test_prec_interior_multi_iteration_parity():
    """PD fixture, many interior iterations: the preconditioned kernel must
    track the preconditioned XLA engine through a genuinely multi-iteration
    trajectory (truncation in |r|_{M^{-1}}, steps in |s|_M)."""
    a_chunk, A_elem, x, _rq, g = _setup(seed=7)
    rq_pd = jnp.float32(0.5)
    prec_chunk, prec_full = _jacobi_prec(rq_pd, 25.0)
    a0c, weights, _ = sphere_rayleigh_streamed(a_chunk)
    B_pd = jnp.asarray([[1.0, 0.2], [0.2, 0.5]], jnp.float32)
    kappa = 1e-3
    res = stpcg_flat_streamed(
        g, x, B_pd, 1e6, aux_scalars=(rq_pd,), a0_chunk=a0c,
        weights=weights, chunk_rows=CR, interpret=True,
        prec_chunk=prec_chunk, prec=prec_full,
        max_iterations=400, kappa_fgr=kappa, theta=0.9)
    A0 = lambda v: 2.0 * A_elem(v) - rq_pd * v
    U = (x, (x, lambda v: 2.0 * A_elem(v)))
    ref = stpcg_flat(g, A0, U, B_pd, 1e6, body_kind="single",
                     max_iterations=400, kappa_fgr=kappa, theta=0.9,
                     prec=prec_full)
    assert abs(int(res.num_iterations) - int(ref.num_iterations)) <= 1
    assert int(res.num_iterations) > 3
    scale = max(float(jnp.linalg.norm(ref.s)), 1e-9)
    np.testing.assert_allclose(np.asarray(res.s), np.asarray(ref.s),
                               atol=2e-3 * scale)
    np.testing.assert_allclose(float(res.predicted_decrease),
                               float(ref.predicted_decrease), rtol=1e-3)


def test_prec_cuts_iterations_on_ill_conditioned_fixture():
    """An exact-Jacobi M^{-1/2} on a wide-spread PD diagonal collapses the
    iteration count (the capability the >VMEM tier forfeited without a prec
    seam — VERDICT round 4, missing 1/2)."""
    spread = 4000.0
    b = spread / (N - 1)

    def a_chunk(i0, aux):
        row = (jax.lax.broadcasted_iota(jnp.int32, (CR, 128), 0)
               .astype(jnp.float32) + jnp.float32(i0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (CR, 128), 1).astype(
            jnp.float32)
        return 1.0 + jnp.float32(b) * (row * 128.0 + lane)

    rq_pd = jnp.float32(0.5)           # A0 = 2A - 0.5 I is PD, cond ~ 5000
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, (N,), jnp.float32)
    x = x / jnp.linalg.norm(x)
    g = jax.random.normal(jax.random.PRNGKey(14), (N,), jnp.float32)
    a0c, weights, _ = sphere_rayleigh_streamed(a_chunk)
    Bz = jnp.zeros((2, 2), jnp.float32)     # pure elementwise Hessian

    def prec_chunk(i0, aux):
        return jax.lax.rsqrt(2.0 * a_chunk(i0, aux) - aux[0])

    def prec_full(v):
        a = 1.0 + jnp.float32(b) * jnp.arange(N, dtype=jnp.float32)
        return v * jax.lax.rsqrt(2.0 * a - rq_pd)

    kw = dict(aux_scalars=(rq_pd,), a0_chunk=a0c, weights=weights,
              chunk_rows=CR, interpret=True, max_iterations=400,
              kappa_fgr=1e-6, theta=0.0)
    plain = stpcg_flat_streamed(g, x, Bz, 1e6, **kw)
    prec = stpcg_flat_streamed(g, x, Bz, 1e6, prec_chunk=prec_chunk,
                               prec=prec_full, **kw)
    # exact Jacobi turns the diagonal system into the identity: one step
    assert int(prec.num_iterations) <= 2
    assert int(plain.num_iterations) >= 10 * int(prec.num_iterations)
    # both solve H s = -g: compare against the closed form
    a = 1.0 + b * jnp.arange(N, dtype=jnp.float32)
    s_true = np.asarray(-g / (2.0 * a - rq_pd))
    scale = float(np.linalg.norm(s_true))
    np.testing.assert_allclose(np.asarray(prec.s), s_true,
                               atol=1e-5 * scale)


def test_prec_validation():
    a_chunk, A_elem, x, rq, g = _setup()
    a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)
    prec_chunk, prec_full = _jacobi_prec(rq, 25.0)
    with pytest.raises(ValueError):      # one form without the other
        stpcg_flat_streamed(g, x, B_fn(rq), 1.0, aux_scalars=(rq,),
                            a0_chunk=a0c, weights=weights, chunk_rows=CR,
                            interpret=True, prec_chunk=prec_chunk)
    from optimization_tpu.linalg.flat_cg import (flat_init_dots,
                                                 sphere_rayleigh_flat)
    A0, U, B, _ = sphere_rayleigh_flat(x, A_elem, rq=rq)
    initd = flat_init_dots(g, A0, U, B)
    with pytest.raises(ValueError):      # init is untransformed
        stpcg_flat_streamed(g, x, B_fn(rq), 1.0, aux_scalars=(rq,),
                            a0_chunk=a0c, weights=weights, chunk_rows=CR,
                            interpret=True, prec_chunk=prec_chunk,
                            prec=prec_full, init=initd)


def test_tnt_flat_solve_prec_matches_flat_prec_engine():
    """TNT routes a preconditioned problem through flat_solve (the streamed
    kernel folding prec_chunk/prec) and matches the XLA flat_prec path's
    optimum — the TNTParams/flat_prec -> flat_solve routing of VERDICT
    round 4 item 2."""
    from optimization_tpu import RiemannianProblem
    from optimization_tpu.linalg.flat_cg import sphere_rayleigh_step
    from optimization_tpu.manifolds import sphere
    from optimization_tpu.solvers import tnt

    n, cr = N, CR
    b = 999.0 / (n - 1)
    M = sphere()

    def A_elem(v):
        i = jnp.arange(n, dtype=jnp.float32)
        return ((1.0 + jnp.float32(b) * i) * v.astype(jnp.float32))

    def a_chunk(i0, aux):
        row = (jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 0)
               .astype(jnp.float32) + jnp.float32(i0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (cr, 128), 1).astype(
            jnp.float32)
        return 1.0 + jnp.float32(b) * (row * 128.0 + lane)

    f = lambda x, dd: jnp.dot(x.astype(jnp.float32), A_elem(x))
    grad = lambda x, dd: M.proj(x, (2.0 * A_elem(x)).astype(x.dtype))

    def flat_qm(x, dd, aux=None):
        rq = aux.rq if aux is not None else None
        A0, U, B, _ = sphere_rayleigh_flat(x, A_elem, rq=rq)
        return A0, U, B    # no init threading with prec

    def mk_prec(rq):
        def prec_chunk(i0, aux):
            return jax.lax.rsqrt(jnp.abs(2.0 * a_chunk(i0, aux)
                                         - aux[0]) + 1.0)

        def prec_full(v):
            a = 1.0 + jnp.float32(b) * jnp.arange(n, dtype=jnp.float32)
            return v * jax.lax.rsqrt(jnp.abs(2.0 * a - rq) + 1.0)

        return prec_chunk, prec_full

    def flat_prec(x, dd):
        a = 1.0 + jnp.float32(b) * jnp.arange(n, dtype=jnp.float32)
        rq = jnp.dot(x.astype(jnp.float32), 2.0 * A_elem(x))
        return lambda v: v * jax.lax.rsqrt(jnp.abs(2.0 * a - rq) + 1.0)

    def precon(x, r, dd):
        a = 1.0 + jnp.float32(b) * jnp.arange(n, dtype=jnp.float32)
        rq = jnp.dot(x.astype(jnp.float32), 2.0 * A_elem(x))
        return r / (jnp.abs(2.0 * a - rq) + 1.0)

    a0c, weights, B_fn = sphere_rayleigh_streamed(a_chunk)

    def flat_solve(g, x, dd, aux, Delta, params):
        # with precon set TNT disables the step_eval aux carry, so the
        # engine recomputes rq itself (same fallback as flat_qm's rq=None)
        rq = (aux.rq if aux is not None
              else jnp.dot(x.astype(jnp.float32), 2.0 * A_elem(x)))
        prec_chunk, prec_full = mk_prec(rq)
        return stpcg_flat_streamed(
            g, x, B_fn(rq), Delta, aux_scalars=(rq,),
            a0_chunk=a0c, weights=weights, chunk_rows=cr, interpret=True,
            prec_chunk=prec_chunk, prec=prec_full,
            max_iterations=params.max_TPCG_iterations,
            kappa_fgr=params.kappa_fgr, theta=params.theta)

    params = tnt.TNTParams(
        max_iterations=40, max_TPCG_iterations=40, gradient_tolerance=1e-3,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0)
    x0 = M.rand(jax.random.PRNGKey(5), n).astype(jnp.float32)
    se = sphere_rayleigh_step(A_elem)

    r_stream = tnt.solve(RiemannianProblem(
        f=f, manifold=M, grad=grad, flat_qm=flat_qm, flat_solve=flat_solve,
        flat_prec=flat_prec, precon=precon, step_eval=se), x0, params)
    r_flat = tnt.solve(RiemannianProblem(
        f=f, manifold=M, grad=grad, flat_qm=flat_qm, flat_prec=flat_prec,
        precon=precon, step_eval=se), x0, params)

    np.testing.assert_allclose(float(r_stream.f), 1.0, atol=5e-3)
    np.testing.assert_allclose(float(r_stream.f), float(r_flat.f),
                               rtol=5e-4)
    assert abs(int(r_stream.num_iterations)
               - int(r_flat.num_iterations)) <= 3


@pytest.mark.parametrize("body", ["single", "pair"])
@pytest.mark.parametrize("Delta", [1e6, 0.5, 0.02])
def test_init_threading_parity(Delta, body):
    """``init=`` (the FlatCGInit dot group riding the caller's fused pass,
    as TNT's step_eval aux supplies it): the kernel must skip its init
    pass and still satisfy the same contract — identical iteration count
    and matching step across interior / truncation / TR-boundary regimes.
    The threaded group is accumulated whole-array while the self-init is
    chunk-wise, so parity is at f32-contract tolerances, not bitwise."""
    from optimization_tpu.linalg.flat_cg import flat_init_dots

    a_chunk, A_elem, x, rq, g = _setup(seed=11)
    A0, U, B, _ = sphere_rayleigh_flat(x, A_elem, rq=rq)
    initd = flat_init_dots(g, A0, U, B)

    ref = _run_streamed(a_chunk, x, rq, g, Delta, body=body,
                        max_iterations=300, kappa_fgr=0.05, theta=0.5)
    res = _run_streamed(a_chunk, x, rq, g, Delta, body=body,
                        max_iterations=300, kappa_fgr=0.05, theta=0.5,
                        init=initd)
    assert abs(int(res.num_iterations) - int(ref.num_iterations)) <= 1, Delta
    np.testing.assert_allclose(float(res.update_step_M_norm),
                               float(ref.update_step_M_norm), rtol=1e-4)
    scale = max(float(jnp.linalg.norm(ref.s)), 1e-9)
    np.testing.assert_allclose(np.asarray(res.s), np.asarray(ref.s),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(float(res.predicted_decrease),
                               float(ref.predicted_decrease),
                               rtol=2e-3, atol=1e-8)
