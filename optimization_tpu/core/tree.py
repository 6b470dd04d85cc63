"""PyTree vector-space helpers.

The reference library is generic over any ``Variable``/``Tangent`` type with
vector-space operators and a ``.dot()`` (``Riemannian/Concepts.h:150-160``).
The JAX counterpart of that genericity is the PyTree: every solver in this
package treats variables and tangents as arbitrary PyTrees of arrays and uses
these helpers for the vector-space algebra, so a "vector" may be a flat array,
a (d, d, n)-stacked block of rotations, or a nested dict of parameters.

All reductions accumulate in the dtype of the inputs; distributed variants
(mesh-sharded inner products reduced with psum) live in
``optimization_tpu.parallel.collectives``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

PyTree = Any


def tree_add(a: PyTree, b: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a: PyTree, b: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(alpha, a: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda x: alpha * x, a)


def tree_axpy(alpha, x: PyTree, y: PyTree) -> PyTree:
    """alpha * x + y."""
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def tree_axpy_like(alpha, x: PyTree, y: PyTree) -> PyTree:
    """alpha * x + y, cast back to each y-leaf's dtype.

    The storage-dtype-preserving axpy: with reduced-precision iterate
    storage (bf16 vectors, f32 scalars) a plain ``alpha * x + y`` promotes
    the result to the scalar's dtype, silently upcasting the loop carry; the
    cast keeps storage at the caller's chosen precision while the arithmetic
    still runs in the promoted dtype.  A no-op for uniform-precision trees.
    """
    return jax.tree_util.tree_map(
        lambda xi, yi: (alpha * xi + yi).astype(yi.dtype), x, y)


def tree_neg(a: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.negative, a)


def tree_zeros_like(a: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_dot(a: PyTree, b: PyTree) -> jnp.ndarray:
    """Euclidean inner product <a, b> over all leaves (scalar)."""
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_norm(a: PyTree) -> jnp.ndarray:
    return jnp.sqrt(tree_dot(a, a))


def tree_where(pred, a: PyTree, b: PyTree) -> PyTree:
    """Leafwise select: pred ? a : b (pred is a scalar boolean)."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_select(pred, a: PyTree, b: PyTree) -> PyTree:
    """Alias of tree_where (kept for readability at call sites)."""
    return tree_where(pred, a, b)
