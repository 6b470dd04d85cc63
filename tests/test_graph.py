"""edge_accumulator strategies: scatter / padded-gather / sorted-segment
must agree on arbitrary multigraphs (self-loops, parallel edges, isolated
vertices, hubs), and the model operators built on them must be identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_tpu.models.graph import edge_accumulator

METHODS = ["scatter", "gather", "sort"]


def _random_graph(seed, n, E, hub=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, E)
    dst = rng.integers(0, n, E)
    src[0] = dst[0] = 3              # self-loop
    src[1] = src[2] = dst[2] = 5     # parallel + another self-loop
    if hub:
        dst[: E // 2] = 0            # hub vertex
    # vertex n-1 stays isolated with high probability at small E
    return src, dst


@pytest.mark.parametrize("trailing", [(), (4,), (3, 2)])
def test_methods_agree(trailing):
    n, E = 23, 60
    src, dst = _random_graph(0, n, E)
    rng = np.random.default_rng(1)
    a_src = jnp.asarray(rng.standard_normal((E,) + trailing))
    a_dst = jnp.asarray(rng.standard_normal((E,) + trailing))

    outs = [edge_accumulator(src, dst, n, method=m)(a_src, a_dst)
            for m in METHODS]
    for out in outs[1:]:
        np.testing.assert_allclose(out, outs[0], rtol=1e-12, atol=1e-12)
    assert outs[0].shape == (n,) + trailing
    # isolated vertices accumulate exactly zero
    touched = np.zeros(n, bool)
    touched[src] = touched[dst] = True
    np.testing.assert_array_equal(np.asarray(outs[0][~touched]), 0.0)


def test_one_sided_src():
    n, E = 11, 30
    src, dst = _random_graph(2, n, E)
    a = jnp.asarray(np.random.default_rng(3).standard_normal((E, 5)))
    outs = [edge_accumulator(src, dst, n, method=m, sides=("src",))(a, None)
            for m in METHODS]
    for out in outs[1:]:
        np.testing.assert_allclose(out, outs[0], rtol=1e-12, atol=1e-12)
    ref = np.zeros((n, 5))
    np.add.at(ref, np.asarray(src), np.asarray(a))
    np.testing.assert_allclose(outs[0], ref, rtol=1e-12, atol=1e-12)


def test_gather_hub_fallback_stays_correct():
    # a hub vertex makes the padded table exceed pad_factor; the gather
    # method must fall back (to sort) and stay correct
    n, E = 400, 500
    src, dst = _random_graph(4, n, E, hub=True)
    a_src = jnp.asarray(np.random.default_rng(5).standard_normal((E,)))
    a_dst = jnp.asarray(np.random.default_rng(6).standard_normal((E,)))
    ref = edge_accumulator(src, dst, n, method="scatter")(a_src, a_dst)
    out = edge_accumulator(src, dst, n, method="gather",
                           pad_factor=2.0)(a_src, a_dst)
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_unknown_method_raises():
    with pytest.raises(ValueError, match="unknown method"):
        edge_accumulator(np.array([0]), np.array([1]), 2, method="magic")


def test_jit_and_grad_safe():
    n, E = 9, 20
    src, dst = _random_graph(7, n, E)
    acc = edge_accumulator(src, dst, n, method="gather")

    @jax.jit
    def loss(a):
        return jnp.sum(acc(a, 2.0 * a) ** 2)

    a = jnp.asarray(np.random.default_rng(8).standard_normal((E, 3)))
    g = jax.grad(loss)(a)
    g_ref = jax.grad(
        lambda a: jnp.sum(edge_accumulator(src, dst, n)(a, 2.0 * a) ** 2))(a)
    np.testing.assert_allclose(g, g_ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("method", ["gather", "sort", "adjacency"])
def test_marginalized_problem_parity(method):
    """f / grad / Hv of the marginalized SE-Sync objective are identical
    across accumulation strategies (f64)."""
    from optimization_tpu.models import pose_sync as ps

    rng = np.random.default_rng(11)
    n, d = 12, 3
    src = np.concatenate([np.arange(n - 1), rng.integers(0, n, 8)])
    dst = np.concatenate([np.arange(1, n), rng.integers(0, n, 8)])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    E = src.shape[0]

    def rand_rot(k):
        q, _ = np.linalg.qr(rng.standard_normal((d, d)))
        return q * np.sign(np.linalg.det(q))

    Mij = jnp.asarray(np.stack([rand_rot(e) for e in range(E)]))
    tij = jnp.asarray(rng.standard_normal((E, d)))

    prob_a, Q_a, _ = ps.marginalized_problem(src, dst, Mij, tij, n=n)
    prob_b, Q_b, _ = ps.marginalized_problem(src, dst, Mij, tij, n=n,
                                             scatter_method=method)

    from optimization_tpu.models import rotation_sync as rs
    Q0 = rs.ROTATIONS.rand(jax.random.PRNGKey(0), n, d, d).astype(Mij.dtype)
    V = rs.ROTATIONS.proj(
        Q0, jnp.asarray(rng.standard_normal((n, d, d))).astype(Mij.dtype))

    np.testing.assert_allclose(prob_a.f(Q0, None), prob_b.f(Q0, None),
                               rtol=1e-10)
    np.testing.assert_allclose(prob_a.grad(Q0, None), prob_b.grad(Q0, None),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(prob_a.hess_vec(Q0, V, None),
                               prob_b.hess_vec(Q0, V, None),
                               rtol=1e-8, atol=1e-10)
    X = jnp.asarray(rng.standard_normal((n * d, 2))).astype(Mij.dtype)
    np.testing.assert_allclose(Q_a(X), Q_b(X), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("method", ["gather", "sort", "adjacency"])
def test_connection_laplacian_parity(method):
    from optimization_tpu.models import rotation_sync as rs

    n, d = 10, 3
    _, data = rs.random_instance(jax.random.PRNGKey(1), n, d,
                                 extra_edges=6, noise=0.1,
                                 dtype=jnp.float64)
    La = rs.connection_laplacian_op(data, n, d)
    Lb = rs.connection_laplacian_op(data, n, d, scatter_method=method)
    X = jnp.asarray(
        np.random.default_rng(2).standard_normal((n * d, 4)))
    np.testing.assert_allclose(La(X), Lb(X), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("method", ["gather", "sort", "adjacency"])
def test_laplacian_apply_parity(method):
    """laplacian_apply strategies agree with the scatter incidence form,
    including self-loops (which contribute exactly zero)."""
    from optimization_tpu.models.graph import laplacian_apply

    n, E = 17, 40
    src, dst = _random_graph(21, n, E)
    rng = np.random.default_rng(22)
    tau = jnp.asarray(rng.uniform(0.5, 2.0, E))
    z = jnp.asarray(rng.standard_normal((n, 3)))
    ref = laplacian_apply(src, dst, tau, n)(z)
    out = laplacian_apply(src, dst, tau, n, method=method)(z)
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)
    # Laplacian invariant: constant fields are in the kernel
    ones = jnp.ones((n, 2))
    np.testing.assert_allclose(
        laplacian_apply(src, dst, tau, n, method=method)(ones), 0.0,
        atol=1e-10)
