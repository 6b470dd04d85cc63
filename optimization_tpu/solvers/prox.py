"""Proximal-operator library.

The reference injects prox operators as ``std::function``s
(``Convex/Concepts.h:46-70``); here the common ones ship as jitted,
vmappable closed-form maps.  All operators follow the convention

    prox_g(x, lam) = argmin_v  g(v) + (1 / (2 lam)) |x - v|^2
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "soft_threshold",
    "group_soft_threshold",
    "prox_l2_squared",
    "project_box",
    "project_nonnegative",
    "prox_zero",
]


def soft_threshold(x, lam):
    """prox of g(x) = |x|_1 (elementwise soft thresholding)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam, 0.0)


def group_soft_threshold(x, lam, axis=None):
    """prox of g(x) = |x|_2 (block/group soft thresholding).

    With ``axis=None`` the whole vector is one group (the group-LASSO prox of
    the reference's proximal-gradient example,
    ``examples/proximal_gradient_example.cpp:40-55``).
    """
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=axis is not None))
    scale = jnp.maximum(1.0 - lam / jnp.maximum(norm, 1e-300), 0.0)
    return scale * x


def prox_l2_squared(x, lam, mu=1.0):
    """prox of g(x) = (mu/2) |x|_2^2."""
    return x / (1.0 + lam * mu)


def project_box(x, lam, lo=0.0, hi=1.0):
    """prox of the indicator of [lo, hi]^n (projection; lam-independent)."""
    return jnp.clip(x, lo, hi)


def project_nonnegative(x, lam):
    """prox of the indicator of the nonnegative orthant."""
    return jnp.maximum(x, 0.0)


def prox_zero(x, lam):
    """prox of g = 0 (identity): recovers plain gradient descent."""
    return x
