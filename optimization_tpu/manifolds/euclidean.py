"""Euclidean space R^n (as a trivial manifold).

Counterpart of the reference's Euclidean sugar (``EuclideanMetric`` /
``EuclideanRetraction``, used by ``EuclideanTNT`` at ``TNT.h:757-773`` and
``EuclideanGradientDescent`` at ``GradientDescent.h:420-433``): the metric is
the standard inner product, the retraction is vector addition, and tangent
projection is the identity.  Variables may be arbitrary PyTrees.
"""

from __future__ import annotations

import jax

from ..core.tree import tree_add, tree_dot
from .base import Manifold


def _retract(x, v):
    return tree_add(x, v)


def _inner(x, u, v):
    return tree_dot(u, v)


def _proj(x, v):
    return v


def _egrad_to_rgrad(x, g):
    return g


def _rand(key, *shape):
    return jax.random.normal(key, shape)


EUCLIDEAN = Manifold(
    name="euclidean",
    retract=_retract,
    inner=_inner,
    proj=_proj,
    egrad_to_rgrad=_egrad_to_rgrad,
    rand=_rand,
)


def euclidean() -> Manifold:
    return EUCLIDEAN
