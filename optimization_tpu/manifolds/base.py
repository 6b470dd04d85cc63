"""Manifold protocol: pure, vmappable geometry functions.

The reference injects geometry as ``std::function`` callbacks — ``metric``,
``retract`` (``Riemannian/Concepts.h:44-112``).  Here a manifold is a frozen
bundle of *pure functions* over arrays/PyTrees, so that a solver jitted once
works for any manifold, and batching a solver over a fleet of problem
instances is a single ``jax.vmap``.

Every manifold supplies:

- ``retract(x, v) -> x'``      retraction of tangent v at x
- ``inner(x, u, v) -> scalar`` Riemannian metric
- ``proj(x, v) -> v'``         orthogonal projection onto T_x(M)
- ``egrad_to_rgrad(x, g)``     Euclidean -> Riemannian gradient
- ``rand(key, *dims)``         a random point (used by examples/tests)

For Riemannian submanifolds of Euclidean space with the induced metric (all
manifolds in this package), the Riemannian Hessian-vector product is obtained
generically as ``proj(x, d/dt rgrad(x + t v))`` via ``jax.jvp`` — users never
write a Hessian (cf. the QuadraticModel seam at reference ``TNT.h:209-222``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

__all__ = ["Manifold"]


@dataclasses.dataclass(frozen=True, eq=False)
class Manifold:
    name: str
    retract: Callable[[Any, Any], Any]
    inner: Callable[[Any, Any, Any], Any]
    proj: Callable[[Any, Any], Any]
    egrad_to_rgrad: Callable[[Any, Any], Any]
    rand: Callable[..., Any]

    def norm(self, x, v):
        import jax.numpy as jnp

        return jnp.sqrt(self.inner(x, v, v))
