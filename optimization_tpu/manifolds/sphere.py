"""Unit sphere S^{n-1} = { x in R^n : |x| = 1 }.

The reference's examples/tests use the sphere with the metric-projection
retraction (``examples/Riemannian_optimization_example.cpp:20-133``,
``tests/TNT_unit_test.cpp:26-122``): we reproduce the same geometry:

- tangent projection:  P_x(v) = v - <x, v> x
- retraction:          R_x(v) = (x + v) / |x + v|   (metric projection)
- metric:              induced Euclidean inner product

Points may carry leading batch dimensions; all ops are written to broadcast
over any leading axes (the sphere acts on the trailing axis), which makes
``jax.vmap`` / scenario-sharded batching free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Manifold


def _acc(u):
    """Accumulation view: sub-f32 storage (bf16/f16) is promoted to f32 for
    reductions — the bf16-storage / f32-accumulate tier.  A no-op for
    f32/f64 inputs (bitwise-identical behavior), and XLA fuses the convert
    into the reduction, so it costs no extra memory traffic."""
    return u.astype(jnp.promote_types(u.dtype, jnp.float32))


def _proj(x, v):
    s = jnp.sum(_acc(x) * _acc(v), axis=-1, keepdims=True)
    return (_acc(v) - s * _acc(x)).astype(v.dtype)


def _retract(x, v):
    y = x + v
    nrm = jnp.linalg.norm(_acc(y), axis=-1, keepdims=True)
    return (y / nrm).astype(y.dtype)


def _inner_scalar(x, u, v):
    return jnp.sum(_acc(u) * _acc(v))


def _egrad_to_rgrad(x, g):
    return _proj(x, g)


def _rand(key, *shape):
    x = jax.random.normal(key, shape)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


SPHERE = Manifold(
    name="sphere",
    retract=_retract,
    inner=_inner_scalar,
    proj=_proj,
    egrad_to_rgrad=_egrad_to_rgrad,
    rand=_rand,
)


def sphere() -> Manifold:
    return SPHERE
