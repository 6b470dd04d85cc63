"""Pallas fused kernels vs plain-XLA references (interpret mode on CPU).

These pin numerical equivalence of the fused kernels; throughput is measured
by bench.py / benchmarks/ on real hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimization_tpu.kernels import cg_dots, diag_stencil_matvec, gram_pair

KEY = jax.random.PRNGKey(7)


@pytest.mark.parametrize("n", [100, 128 * 8, 12345])
def test_cg_dots_matches_reference(n):
    k1, k2, k3 = jax.random.split(KEY, 3)
    p = jax.random.normal(k1, (n,), jnp.float32)
    hp = jax.random.normal(k2, (n,), jnp.float32)
    r = jax.random.normal(k3, (n,), jnp.float32)
    a, b, c, d = cg_dots(p, hp, r, block_rows=8)
    np.testing.assert_allclose(a, jnp.dot(p, hp), rtol=1e-5)
    np.testing.assert_allclose(b, jnp.dot(hp, hp), rtol=1e-5)
    np.testing.assert_allclose(c, jnp.dot(p, p), rtol=1e-5)
    np.testing.assert_allclose(d, jnp.dot(p, r), rtol=1e-5)


@pytest.mark.parametrize("m,k", [(256, 8), (1000, 24), (513, 30)])
def test_gram_pair_matches_reference(m, k):
    k1, k2, k3 = jax.random.split(KEY, 3)
    S = jax.random.normal(k1, (m, k), jnp.float32)
    AS = jax.random.normal(k2, (m, k), jnp.float32)
    BS = jax.random.normal(k3, (m, k), jnp.float32)
    GA, GB = gram_pair(S, AS, BS, block_rows=128)
    np.testing.assert_allclose(GA, S.T @ AS, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(GB, S.T @ BS, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", [64, 1024, 4097])
def test_diag_stencil_matvec(n):
    k1, k2 = jax.random.split(KEY)
    d = jax.random.normal(k1, (n,), jnp.float32) ** 2 + 1.0
    v = jax.random.normal(k2, (n,), jnp.float32)
    up = jnp.concatenate([v[1:], jnp.zeros((1,), v.dtype)])
    down = jnp.concatenate([jnp.zeros((1,), v.dtype), v[:-1]])
    expected = d * v + 2.0 * v - up - down
    got = diag_stencil_matvec(d, v)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n", [64, 1024, 300000])
def test_affine_stencil_matvec(n):
    from optimization_tpu.kernels import affine_stencil_matvec
    a, b = 1.0, 3.5e-4
    v = jax.random.normal(KEY, (n,), jnp.float32)
    d = a + b * jnp.arange(n, dtype=jnp.float32)
    up = jnp.concatenate([v[1:], jnp.zeros((1,), v.dtype)])
    down = jnp.concatenate([jnp.zeros((1,), v.dtype), v[:-1]])
    expected = (d * v + 2.0 * v - up - down) * 0.5
    got = affine_stencil_matvec(v, a=a, b=b, scale=0.5)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n", [100, 4096, 100001])
def test_axpy_selfdot(n):
    from optimization_tpu.kernels import axpy_selfdot
    k1, k2 = jax.random.split(KEY)
    x = jax.random.normal(k1, (n,), jnp.float32)
    y = jax.random.normal(k2, (n,), jnp.float32)
    alpha = jnp.float32(0.37)
    out, dot = axpy_selfdot(alpha, x, y)
    want = alpha * x + y
    # fma-ordering ULP differences on near-zero elements
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(dot, jnp.dot(want, want), rtol=1e-4)
