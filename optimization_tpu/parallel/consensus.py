"""Global-consensus ADMM over scenario shards.

Solves   min_x  sum_i f_i(x) + g(x)   by the consensus splitting

    min  sum_i f_i(x_i) + g(z)   s.t.  x_i - z = 0  for all i

mapped onto the generic :mod:`optimization_tpu.solvers.admm` engine with
VariableX = the stacked per-scenario block (N, ...), VariableY = the global
consensus variable z, A = identity, B = -broadcast, c = 0 (the seam described
at reference ``ADMM.h:378-402``, distributed per SURVEY.md section 2.9).

The stacked x-block is sharded over the mesh "batch" axis; the z-update is a
mean over scenarios, which the GSPMD partitioner lowers to an all-reduce over
ICI — the only cross-chip communication per iteration.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..solvers.admm import ADMMProblem

__all__ = ["consensus_problem"]


def consensus_problem(
    local_argmin: Callable[..., Any],
    prox_g: Optional[Callable[..., Any]] = None,
) -> ADMMProblem:
    """Build the consensus-form ADMMProblem.

    - ``local_argmin(z, lam_i, rho, data_i) -> x_i``: per-scenario minimizer
      of  f_i(x) + <lam_i, x> + (rho/2) |x - z|^2  (vmapped over the leading
      scenario axis of lam/data).
    - ``prox_g(v, lam, data) -> z``: optional prox of the shared regularizer g
      (g = 0, i.e. plain averaging, when omitted).

    Use with ``admm.solve(problem, c=0-block, x0=(N, ...) zeros, y0=z0,
    data=per_scenario_data)``.
    """

    def minLx(z, lam, rho, data):
        return jax.vmap(
            lambda lam_i, data_i: local_argmin(z, lam_i, rho, data_i)
        )(lam, data)

    def minLy(x, lam, rho, data):
        n = x.shape[0]
        v = jnp.mean(x + lam / rho, axis=0)
        if prox_g is None:
            return v
        # z-update: prox of g with weight 1/(N rho) (Boyd Sec. 7.1)
        return prox_g(v, 1.0 / (n * rho), data)

    return ADMMProblem(
        minLx=minLx,
        minLy=minLy,
        A=lambda x, d: x,
        B=lambda z, d: -jnp.broadcast_to(z, d_shape(z, d)),
        At=lambda r, d: r,
    )


def d_shape(z, data):
    """Shape of the stacked residual block: (N, *z.shape) with N inferred
    from the leading axis of the (required) per-scenario data PyTree."""
    leading = jax.tree_util.tree_leaves(data)[0].shape[0]
    return (leading,) + tuple(z.shape)
