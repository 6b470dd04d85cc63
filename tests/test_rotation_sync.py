"""Rotation-synchronization model tests (the SE-Sync-style flagship).

The reference library is the solver engine behind SE-Sync; this exercises the
full pipeline the reference was built for: chordal (spectral) initialization
via LOBPCG on the connection Laplacian, then Riemannian TNT refinement on
SO(3)^n, asserting convergence to the noise floor on multiple instances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_tpu.core.types import TNTStatus
from optimization_tpu.models import rotation_sync as rs
from optimization_tpu.solvers import tnt


N, D = 24, 3

PARAMS = tnt.TNTParams(
    max_iterations=100, gradient_tolerance=1e-8,
    relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
    preconditioned_gradient_tolerance=0.0)


def _instance(seed, noise=0.05):
    return rs.random_instance(jax.random.PRNGKey(seed), N, D,
                              extra_edges=2 * N, noise=noise,
                              dtype=jnp.float64)


def test_instance_properties():
    R_true, data = _instance(0)
    # Ground truth rotations are orthogonal with det +1
    eye = jnp.swapaxes(R_true, -1, -2) @ R_true
    np.testing.assert_allclose(np.asarray(eye),
                               np.tile(np.eye(D), (N, 1, 1)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R_true)),
                               np.ones(N), atol=1e-12)
    # Noiseless measurements give zero cost at the truth
    _, clean = rs.random_instance(jax.random.PRNGKey(0), N, D,
                                  extra_edges=2 * N, noise=0.0,
                                  dtype=jnp.float64)
    assert float(rs.chordal_cost(R_true, clean)) < 1e-20


def test_spectral_init_quality():
    R_true, data = _instance(1)
    R0 = rs.spectral_init(data, N, D)
    # Valid rotations
    eye = jnp.swapaxes(R0, -1, -2) @ R0
    np.testing.assert_allclose(np.asarray(eye),
                               np.tile(np.eye(D), (N, 1, 1)), atol=1e-6)
    assert (np.asarray(jnp.linalg.det(R0)) > 0).all()
    # Close to the truth already (low noise)
    assert float(rs.mean_rotation_error(R0, R_true)) < 0.2


def test_pipeline_converges():
    problem = rs.make_problem()
    for seed in (2, 3):
        R_true, data = _instance(seed)
        R0 = rs.spectral_init(data, N, D)
        res = tnt.solve(problem, R0, PARAMS, data=data)
        assert int(res.status) == TNTStatus.GRADIENT
        # Newton phase: just a handful of outer iterations from chordal init
        assert int(res.num_iterations) <= 20
        assert float(rs.mean_rotation_error(res.x, R_true)) < 0.1
        # Iterates stay on SO(3)^n
        eye = jnp.swapaxes(res.x, -1, -2) @ res.x
        np.testing.assert_allclose(np.asarray(eye),
                                   np.tile(np.eye(D), (N, 1, 1)), atol=1e-9)


def test_flat_engine_matches_generic():
    """make_problem(flat=True) routes TNT through the single-sync flat
    engine with the full Hessian closure as the fusible operator; the
    converged optimum, status, and effort match the generic engine at
    every group size."""
    R_true, data = _instance(6)
    R0 = rs.spectral_init(data, N, D)
    ref = tnt.solve(rs.make_problem(), R0, PARAMS, data=data)
    assert int(ref.status) == TNTStatus.GRADIENT
    for s in (1, 2, 3):
        params = tnt.TNTParams(
            max_iterations=100, gradient_tolerance=1e-8,
            relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
            preconditioned_gradient_tolerance=0.0, flat_s_steps=s)
        res = tnt.solve(rs.make_problem(flat=True), R0, params, data=data)
        assert int(res.status) == TNTStatus.GRADIENT, s
        np.testing.assert_allclose(float(res.f), float(ref.f), rtol=1e-10)
        assert abs(int(res.num_iterations) - int(ref.num_iterations)) <= 2
        err = rs.mean_rotation_error(res.x, ref.x)
        assert float(err) < 1e-6, (s, float(err))
        # manifold integrity through the flat path
        eye = jnp.swapaxes(res.x, -1, -2) @ res.x
        np.testing.assert_allclose(np.asarray(eye),
                                   np.tile(np.eye(D), (N, 1, 1)), atol=1e-9)


def test_connection_laplacian_psd_and_kernel():
    R_true, data = rs.random_instance(jax.random.PRNGKey(4), N, D,
                                      extra_edges=2 * N, noise=0.0,
                                      dtype=jnp.float64)
    L = rs.connection_laplacian_op(data, N, D)
    # The stacked truth spans the kernel in the noiseless case
    X = R_true.reshape(N * D, D)
    assert float(jnp.linalg.norm(L(X))) < 1e-10
    # PSD: random probes have nonnegative quadratic form
    probes = jax.random.normal(jax.random.PRNGKey(5), (N * D, 4))
    quad = jnp.sum(probes * L(probes), axis=0)
    assert (np.asarray(quad) > -1e-10).all()


def test_weighted_chordal_cost_and_laplacian():
    """Per-edge kappa weights (surfaced by the g2o loader) scale both the
    chordal cost and the connection Laplacian consistently."""
    R_true, data = _instance(6)
    kappa = 1.0 + jnp.arange(data.src.shape[0], dtype=jnp.float64) / 10.0
    wdata = rs.RotationSyncData(src=data.src, dst=data.dst, Rij=data.Rij,
                                kappa=kappa)
    # kappa = ones is identical to the unweighted cost
    ones = rs.RotationSyncData(src=data.src, dst=data.dst, Rij=data.Rij,
                               kappa=jnp.ones_like(kappa))
    R = rs.ROTATIONS.rand(jax.random.PRNGKey(0), N, D, D)
    np.testing.assert_allclose(float(rs.chordal_cost(R, ones)),
                               float(rs.chordal_cost(R, data)), rtol=1e-12)
    # Weighted cost equals the sum of per-edge weighted squared residuals
    Ri, Rj = R[data.src], R[data.dst]
    diff = Ri - jnp.einsum("eij,ejk->eik", data.Rij, Rj)
    per_edge = jnp.sum(diff * diff, axis=(-1, -2))
    np.testing.assert_allclose(float(rs.chordal_cost(R, wdata)),
                               float(jnp.sum(kappa * per_edge)), rtol=1e-12)
    # Weighted Laplacian still kills the truth in the noiseless case
    _, clean = rs.random_instance(jax.random.PRNGKey(6), N, D,
                                  extra_edges=2 * N, noise=0.0,
                                  dtype=jnp.float64)
    wclean = rs.RotationSyncData(src=clean.src, dst=clean.dst, Rij=clean.Rij,
                                 kappa=kappa)
    L = rs.connection_laplacian_op(wclean, N, D)
    R_true6, _ = rs.random_instance(jax.random.PRNGKey(6), N, D,
                                    extra_edges=2 * N, noise=0.0,
                                    dtype=jnp.float64)
    assert float(jnp.linalg.norm(L(R_true6.reshape(N * D, D)))) < 1e-10


def test_pipeline_with_weights():
    """TNT on the weighted cost converges from spectral init."""
    R_true, data = _instance(7)
    kappa = jnp.full(data.src.shape, 4.0, jnp.float64)
    wdata = rs.RotationSyncData(src=data.src, dst=data.dst, Rij=data.Rij,
                                kappa=kappa)
    R0 = rs.spectral_init(wdata, N, D)
    res = tnt.solve(rs.make_problem(), R0, PARAMS, data=wdata)
    assert int(res.status) == TNTStatus.GRADIENT
    assert float(rs.mean_rotation_error(res.x, R_true)) < 0.1


def test_chordal_cost_equals_laplacian_quadratic_form():
    """f(R) = tr(X' L X) with X = R.reshape(nd, d) — the identity the
    certification stage rests on (weighted case)."""
    R_true, data = _instance(8)
    kappa = 1.0 + jnp.arange(data.src.shape[0], dtype=jnp.float64) / 7.0
    wdata = rs.RotationSyncData(src=data.src, dst=data.dst, Rij=data.Rij,
                                kappa=kappa)
    R = rs.ROTATIONS.rand(jax.random.PRNGKey(2), N, D, D)
    L = rs.connection_laplacian_op(wdata, N, D)
    X = R.reshape(N * D, D)
    np.testing.assert_allclose(float(rs.chordal_cost(R, wdata)),
                               float(jnp.trace(X.T @ L(X))), rtol=1e-12)


def test_certificate_noiseless_optimum():
    _, clean = rs.random_instance(jax.random.PRNGKey(9), N, D,
                                  extra_edges=2 * N, noise=0.0,
                                  dtype=jnp.float64)
    R0 = rs.spectral_init(clean, N, D)
    res = tnt.solve(rs.make_problem(), R0, PARAMS, data=clean)
    cert = rs.certify(res.x, clean)
    assert float(cert.stationarity) < 1e-7
    assert bool(cert.certified)
    assert abs(float(cert.lam_min)) < 1e-4  # resolved to LOBPCG tau


def test_certificate_noisy_optimum():
    R_true, data = _instance(10, noise=0.05)
    R0 = rs.spectral_init(data, N, D)
    res = tnt.solve(rs.make_problem(), R0, PARAMS, data=data)
    assert int(res.status) == TNTStatus.GRADIENT
    cert = rs.certify(res.x, data)
    assert float(cert.stationarity) < 1e-6
    assert bool(cert.certified)   # SE-Sync certifies at this noise level


def test_certificate_rejects_non_optimum():
    _, data = _instance(11, noise=0.05)
    R_bad = rs.ROTATIONS.rand(jax.random.PRNGKey(42), N, D, D)
    cert = rs.certify(R_bad, data)
    # Random rotations are not even stationary; the certificate must fail
    assert float(cert.stationarity) > 1e-2
    assert not bool(cert.certified)
    assert float(cert.lam_min) < 0


@pytest.mark.slow
def test_certify_vmapped_fleet():
    """Certification vmaps over a fleet sharing one edge topology."""
    B = 3
    R_trues, data = rs.random_fleet(jax.random.PRNGKey(12), B, N, D,
                                    extra_edges=2 * N, noise=0.03,
                                    dtype=jnp.float64)
    R0s = jnp.stack([
        rs.spectral_init(rs.RotationSyncData(src=data.src, dst=data.dst,
                                             Rij=data.Rij[i]), N, D)
        for i in range(B)])

    def solve_and_certify(R0, Rij):
        d_i = rs.RotationSyncData(src=data.src, dst=data.dst, Rij=Rij)
        res = tnt.solve(rs.make_problem(), R0, PARAMS, data=d_i)
        cert = rs.certify(res.x, d_i)
        return res.x, cert.certified, cert.stationarity

    xs, certified, stat = jax.vmap(solve_and_certify)(R0s, data.Rij)
    assert bool(jnp.all(certified))
    assert float(jnp.max(stat)) < 1e-6


@pytest.mark.slow
def test_robust_gnc_rejects_outliers():
    """20% of the edges replaced by random rotations: the plain weighted
    solve is dragged off, GNC recovers the truth and drives the outlier
    weights to ~0."""
    R_true, data = _instance(13, noise=0.02)
    E = int(data.src.shape[0])
    n_out = E // 5
    k1, k2 = jax.random.split(jax.random.PRNGKey(99))
    out_idx = jax.random.choice(k1, E, (n_out,), replace=False)
    bad = rs.ROTATIONS.rand(k2, n_out, D, D).astype(jnp.float64)
    Rij_corrupt = data.Rij.at[out_idx].set(bad)
    cdata = rs.RotationSyncData(src=data.src, dst=data.dst, Rij=Rij_corrupt)

    # Plain solve from spectral init: contaminated
    R0 = rs.spectral_init(cdata, N, D)
    plain = tnt.solve(rs.make_problem(), R0, PARAMS, data=cdata)
    err_plain = float(rs.mean_rotation_error(plain.x, R_true))

    rob = rs.solve_robust(cdata, N, D, params=PARAMS)
    R_rob, w = rob.R, rob.weights
    assert bool(rob.all_identifiable)
    err_rob = float(rs.mean_rotation_error(R_rob, R_true))

    assert err_rob < 0.05
    assert err_rob < 0.5 * err_plain
    # Outlier edges are down-weighted far below inliers
    w = np.asarray(w)
    inlier_mask = np.ones(E, bool)
    inlier_mask[np.asarray(out_idx)] = False
    assert np.median(w[~inlier_mask]) < 0.1 * np.median(w[inlier_mask])


def _ring_instance(seed, n=12, d=3, noise=0.3):
    """Weakly-connected ring at moderate noise: from a random init the
    chordal TNT frequently converges to a non-global critical point (the
    dual certificate fails with a clearly negative eigenvalue) — the
    regime the Riemannian staircase exists for."""
    key = jax.random.PRNGKey(seed)
    R_true, _ = rs.random_instance(key, n, d, extra_edges=0, noise=0.0,
                                   dtype=jnp.float64)
    src = jnp.concatenate([jnp.arange(n - 1, dtype=jnp.int32),
                           jnp.array([n - 1], jnp.int32)])
    dst = jnp.concatenate([jnp.arange(1, n, dtype=jnp.int32),
                           jnp.array([0], jnp.int32)])
    k2 = jax.random.PRNGKey(100 + seed)
    Rij = R_true[src] @ jnp.swapaxes(R_true[dst], -1, -2)
    w = noise * jax.random.normal(k2, (n, d, d), jnp.float64)
    skew = 0.5 * (w - jnp.swapaxes(w, -1, -2))
    pert = rs._orthonormalize(jnp.eye(d) + skew + 0.5 * (skew @ skew))
    return rs.RotationSyncData(src=src, dst=dst, Rij=pert @ Rij)


@pytest.mark.slow
def test_staircase_escapes_stuck_critical_point():
    """The Riemannian staircase lifts a certified-suboptimal critical
    point through higher-rank relaxations, escapes along the certificate
    eigenvector, and returns a certified global optimum rounded back to
    SO(d)^n (the SE-Sync algorithm; solver = the reference TNT at every
    rank)."""
    n, d = 12, 3
    params = tnt.TNTParams(
        max_iterations=200, gradient_tolerance=1e-10,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0)
    data = _ring_instance(0)
    R0 = rs.ROTATIONS.rand(jax.random.PRNGKey(1000), n, d, d)

    # the plain solve from this init is genuinely stuck
    plain = tnt.solve(rs.make_problem(), R0, params, data=data)
    cert0 = rs.certify(plain.x, data, tau=1e-6)
    assert not bool(cert0.certified)
    assert float(cert0.lam_min) < -1e-2

    out = rs.solve_staircase(data, n, d, params=params, R0=R0,
                             cert_tau=1e-6)
    assert bool(out.certified)
    assert out.p_final > d                       # it had to climb
    assert out.levels[0][3] is False             # level d not certified
    assert out.levels[-1][3] is True             # final level certified
    assert out.rank_gap < 1e-6                   # rounding was exact
    # strictly better objective than the stuck point, on SO(d)^n
    assert float(out.result.f) < 0.2 * float(plain.f)
    eye = jnp.swapaxes(out.R, -1, -2) @ out.R
    np.testing.assert_allclose(np.asarray(eye),
                               np.tile(np.eye(d), (n, 1, 1)), atol=1e-9)
    assert (np.asarray(jnp.linalg.det(out.R)) > 0).all()


def test_staircase_certified_instance_stops_at_level_d():
    """On an easy instance from spectral init the staircase certifies at
    p = d and never lifts."""
    R_true, data = _instance(9)
    out = rs.solve_staircase(data, N, D, params=PARAMS)
    assert bool(out.certified)
    assert out.p_final == D
    assert len(out.levels) == 1
    assert float(rs.mean_rotation_error(out.R, R_true)) < 0.1


@pytest.mark.slow
def test_gnc_identifiability_flags_local_outlier_majority():
    """A vertex whose incident edges are majority-corrupted (mutually
    inconsistent random rotations) is fundamentally ambiguous between
    robust basins; solve_robust flags exactly that vertex as
    non-identifiable while a globally-identifiable instance stays clean
    (docs/ROADMAP.md round-2 'GNC identifiability' item)."""
    R_true, data = _instance(17, noise=0.02)
    src, dst = np.asarray(data.src), np.asarray(data.dst)
    v = 10
    inc = np.where((src == v) | (dst == v))[0]
    assert len(inc) >= 3
    n_corr = int(np.ceil(0.75 * len(inc)))   # strict local majority
    corr = inc[:n_corr]
    bad = rs.ROTATIONS.rand(jax.random.PRNGKey(5), n_corr, D, D).astype(
        jnp.float64)
    cdata = rs.RotationSyncData(src=data.src, dst=data.dst,
                                Rij=data.Rij.at[jnp.asarray(corr)].set(bad))

    rob = rs.solve_robust(cdata, N, D, params=PARAMS)
    ident = np.asarray(rob.identifiable)
    assert not bool(rob.all_identifiable)
    assert not ident[v], "locally-outlier-majority vertex must be flagged"
    # the contamination is local: the vast majority of vertices stay clean
    assert ident.sum() >= N - 3

    # control: the uncorrupted instance is fully identifiable
    clean = rs.solve_robust(data, N, D, params=PARAMS)
    assert bool(clean.all_identifiable)


def _hub_chain_instance(key, n=40, d=3, noise=0.02):
    """Ill-conditioned instance: a chain plus a hub vertex connected to all
    others, with per-edge kappa weights spanning four orders of magnitude —
    the weighted vertex degrees then spread widely and the connection
    Laplacian's conditioning is poor, so Jacobi preconditioning has real
    work to do (measured ~1.8x fewer inner CG iterations on this fixture)."""
    k1, k2, k3 = jax.random.split(key, 3)
    R_true = rs.ROTATIONS.rand(k1, n, d, d)
    src = jnp.concatenate([jnp.arange(n - 1, dtype=jnp.int32),
                           jnp.zeros((n - 1,), jnp.int32)])
    dst = jnp.concatenate([jnp.arange(1, n, dtype=jnp.int32),
                           jnp.arange(1, n, dtype=jnp.int32)])
    Rij_clean = R_true[src] @ jnp.swapaxes(R_true[dst], -1, -2)
    w = noise * jax.random.normal(k2, (src.shape[0], d, d))
    skew = 0.5 * (w - jnp.swapaxes(w, -1, -2))
    pert = rs._orthonormalize(jnp.eye(d) + skew + 0.5 * (skew @ skew))
    kappa = 10.0 ** jax.random.uniform(k3, (2 * (n - 1),),
                                       minval=-2.0, maxval=2.0)
    return R_true, rs.RotationSyncData(src=src, dst=dst,
                                       Rij=pert @ Rij_clean, kappa=kappa)


@pytest.mark.slow
def test_jacobi_preconditioned_tnt():
    """Block-Jacobi preconditioning (ref TNT.h:122-125 seam): same optimum,
    measurably fewer inner CG iterations on an ill-conditioned graph."""
    R_true, data = _hub_chain_instance(jax.random.PRNGKey(7))
    n = int(R_true.shape[0])
    R0 = rs.spectral_init(data, n, 3)

    params = tnt.TNTParams(
        max_iterations=60, gradient_tolerance=1e-8,
        relative_decrease_tolerance=0.0, stepsize_tolerance=0.0,
        preconditioned_gradient_tolerance=0.0, max_TPCG_iterations=500)

    plain = tnt.solve(rs.make_problem(), R0, params, data=data)
    pre = tnt.solve(rs.make_problem(preconditioned=True), R0, params,
                    data=data)

    assert int(pre.status) == TNTStatus.GRADIENT
    np.testing.assert_allclose(float(pre.f), float(plain.f),
                               rtol=1e-10, atol=1e-12)

    def inner_total(res):
        k = int(res.num_iterations)
        return int(np.sum(np.asarray(res.inner_iterations)[:k]))

    ip, i0 = inner_total(pre), inner_total(plain)
    # The preconditioner must pay for itself in inner iterations (the
    # measured effect on this fixture is ~2-3x; keep slack for platform
    # variation but require a real reduction).
    assert ip < 0.75 * i0, (ip, i0)


def test_jacobi_precon_is_spd_scaling():
    """The preconditioner is a positive per-block scaling: symmetric in the
    ambient inner product and tangency-preserving."""
    R_true, data = _hub_chain_instance(jax.random.PRNGKey(3), n=12)
    key = jax.random.PRNGKey(0)
    x = R_true
    u = rs.ROTATIONS.proj(x, jax.random.normal(key, x.shape))
    v = rs.ROTATIONS.proj(x, jax.random.normal(jax.random.PRNGKey(1),
                                               x.shape))
    Pu = rs.jacobi_precon(x, u, data)
    Pv = rs.jacobi_precon(x, v, data)
    np.testing.assert_allclose(float(jnp.sum(u * Pv)),
                               float(jnp.sum(Pu * v)), rtol=1e-5)
    # Tangency preserved exactly (per-block scalar scaling)
    np.testing.assert_allclose(np.asarray(rs.ROTATIONS.proj(x, Pu)),
                               np.asarray(Pu), atol=1e-6)
    assert float(jnp.sum(u * Pu)) > 0


def test_certify_chol_rr_parity():
    """rr_method="chol" (one eigh per LOBPCG iteration) certifies the same
    optimum with a matching lam_min at the certificate tolerance — the
    cheap-RR path is safe for the certification surface."""
    R_true, data = _instance(12, noise=0.05)
    R0 = rs.spectral_init(data, N, D, rr_method="chol")
    res = tnt.solve(rs.make_problem(), R0, PARAMS, data=data)
    cert_e = rs.certify(res.x, data)
    cert_c = rs.certify(res.x, data, rr_method="chol")
    assert bool(cert_c.certified) == bool(cert_e.certified) == True  # noqa: E712
    assert abs(float(cert_c.lam_min) - float(cert_e.lam_min)) < 1e-4


def test_certify_block_jacobi_preconditioner():
    """precondition=True: same certificate, measurably fewer LOBPCG
    iterations on a weighted graph with a wide kappa spread (the block-
    Jacobi T equilibrates the per-vertex scales; measured ~25-30% at tight
    tau — it cannot compress the near-null certificate eigenvalue)."""
    _, data0 = _instance(14, noise=0.02)
    kap = jnp.exp(jax.random.uniform(jax.random.PRNGKey(8),
                                     (data0.src.shape[0],),
                                     minval=0.0, maxval=9.0))
    data = rs.RotationSyncData(src=data0.src, dst=data0.dst,
                               Rij=data0.Rij, kappa=kap)
    R0 = rs.spectral_init(data, N, D)
    res = tnt.solve(rs.make_problem(), R0, PARAMS, data=data)
    cert_plain = rs.certify(res.x, data, tau=1e-6, max_iterations=600)
    cert_pc = rs.certify(res.x, data, tau=1e-6, max_iterations=600,
                         precondition=True)
    assert bool(cert_pc.certified) == bool(cert_plain.certified) == True  # noqa: E712
    # both lam_min estimates resolve ~0 at the tight tolerance
    assert abs(float(cert_pc.lam_min) - float(cert_plain.lam_min)) < 1e-4
    assert (int(cert_pc.num_iterations)
            <= 0.85 * int(cert_plain.num_iterations))
