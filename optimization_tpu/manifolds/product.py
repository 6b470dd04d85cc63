"""Product manifolds: M1 x M2 x ... over PyTree-structured variables.

The reference achieves products implicitly (any type with vector-space ops can
be a Variable).  Here a product manifold zips per-factor geometry over the
leaves of a PyTree variable: ``x = (x_sphere, x_euclidean, ...)``.
"""

from __future__ import annotations

from typing import Sequence

import jax

from .base import Manifold


def product(factors: Sequence[Manifold], treedef=None) -> Manifold:
    """Product of manifolds acting on a tuple-structured variable.

    ``x``, ``v`` are tuples (or lists) with one entry per factor.
    """

    factors = tuple(factors)

    def _retract(x, v):
        return tuple(m.retract(xi, vi) for m, xi, vi in zip(factors, x, v))

    def _inner(x, u, v):
        total = 0.0
        for m, xi, ui, vi in zip(factors, x, u, v):
            total = total + m.inner(xi, ui, vi)
        return total

    def _proj(x, v):
        return tuple(m.proj(xi, vi) for m, xi, vi in zip(factors, x, v))

    def _egrad_to_rgrad(x, g):
        return tuple(m.egrad_to_rgrad(xi, gi) for m, xi, gi in zip(factors, x, g))

    def _rand(key, *shapes):
        keys = jax.random.split(key, len(factors))
        return tuple(m.rand(k, *s) for m, k, s in zip(factors, keys, shapes))

    return Manifold(
        name="x".join(m.name for m in factors),
        retract=_retract,
        inner=_inner,
        proj=_proj,
        egrad_to_rgrad=_egrad_to_rgrad,
        rand=_rand,
    )
