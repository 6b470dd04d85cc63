"""Grassmann manifold Gr(n, p): p-dimensional subspaces of R^n.

Points are represented by orthonormal bases X in St(n, p); the geometry is
the quotient of the Stiefel manifold by the right O(p) action (a subspace
does not care about its basis).  Practically this changes one thing relative
to Stiefel: the tangent (horizontal) space is {V : X'V = 0}, which removes
the within-subspace rotation directions — exactly the gauge directions that
make Stiefel trust-region solves stall on O(p)-invariant objectives (see
tests/test_tnt.py::test_tnt_stiefel_eigenspace).  On Gr(n, p) the Brockett /
Rayleigh objective has a nondegenerate Hessian at isolated minimizers and
TNT converges quadratically to tight gradient tolerances.

Geometry (canonical metric inherited from the embedding):

- tangent/horizontal projection:  P_X(V) = V - X (X'V)
- retraction: polar retraction (orthonormal factor of X + V); for horizontal
  V, (X+V)'(X+V) = I + V'V, so the same eigh-based inverse-sqrt route as
  Stiefel applies and the result represents the retracted subspace.
- metric: Frobenius inner product on horizontal vectors.

The generic Hessian-vector product (tangent-projected jvp of the projected
gradient field, ``core/problem.py``) is the correct Riemannian Hessian on
the quotient for horizontal directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Manifold
from .stiefel import _acc, _mm, _polar_retract, _rand_stiefel

__all__ = ["GRASSMANN", "grassmann"]


def _proj(x, v):
    # bf16 tier: products accumulate f32 (stiefel._acc inside _mm), the
    # result returns in the storage dtype.
    return (_acc(v) - _mm(x, _mm(jnp.swapaxes(x, -1, -2), v))).astype(v.dtype)


def _inner(x, u, v):
    return jnp.sum(_acc(u) * _acc(v))


GRASSMANN = Manifold(
    name="grassmann",
    retract=_polar_retract,
    inner=_inner,
    proj=_proj,
    egrad_to_rgrad=_proj,
    rand=_rand_stiefel,
)


def grassmann() -> Manifold:
    return GRASSMANN
