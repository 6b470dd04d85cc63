"""Named reduction primitives: the distributed seam of every solver.

The reference's algorithms communicate *only* through injected inner products,
operator applications, and Gram-matrix formation (SURVEY.md section 2.9).
Those are exactly the reduction points that become XLA collectives on a TPU
mesh.  This module packages them so solver code never mentions mesh axes:

- under plain ``jit`` with ``NamedSharding``-annotated arguments, the GSPMD
  partitioner inserts the collectives automatically — solvers need nothing;
- inside ``shard_map``-ed code (manual-collective kernels, consensus ADMM),
  use these wrappers.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.tree import tree_dot

__all__ = ["pdot", "pnorm", "pmean_tree", "sharded_inner", "psum_scalar",
           "sharded_gram", "sharded_gram_pair"]


def psum_scalar(x, axis) -> jnp.ndarray:
    return jax.lax.psum(x, axis)


def pdot(u: Any, v: Any, axis) -> jnp.ndarray:
    """Distributed inner product: local PyTree dot + psum over ``axis``."""
    return jax.lax.psum(tree_dot(u, v), axis)


def pnorm(u: Any, axis) -> jnp.ndarray:
    return jnp.sqrt(pdot(u, u, axis))


def pmean_tree(tree: Any, axis) -> Any:
    """Leafwise pmean — the consensus-averaging primitive for ADMM."""
    return jax.tree_util.tree_map(lambda l: jax.lax.pmean(l, axis), tree)


def sharded_gram(S_local: jnp.ndarray, AS_local: jnp.ndarray,
                 axis) -> jnp.ndarray:
    """Distributed Gram matrix ``S' AS`` for a basis row-sharded over
    ``axis`` (the long-vector / SP-analog seam of SURVEY.md section 2.9,
    mapping the LOBPCG Gram stage ``LOBPCG.h:271-272``): each shard forms its
    local (k x k) contribution on the MXU, then one small psum rides ICI."""
    local = jnp.matmul(S_local.T, AS_local,
                       precision=jax.lax.Precision.HIGHEST)
    return jax.lax.psum(local, axis)


def sharded_gram_pair(S_local, AS_local, BS_local, axis):
    """``(S'AS, S'BS)`` with a single fused psum over ``axis``."""
    ga = jnp.matmul(S_local.T, AS_local,
                    precision=jax.lax.Precision.HIGHEST)
    gb = jnp.matmul(S_local.T, BS_local,
                    precision=jax.lax.Precision.HIGHEST)
    return jax.lax.psum((ga, gb), axis)


def sharded_inner(axis) -> Callable[[Any, Any, Any], jnp.ndarray]:
    """A manifold-metric-shaped inner product (x, u, v) -> scalar that
    reduces across ``axis`` — inject into a Manifold for shard_map-ed solves."""

    def inner(x, u, v):
        return pdot(u, v, axis)

    return inner
