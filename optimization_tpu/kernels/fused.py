"""Fused Pallas TPU kernels for the solver hot loops.

Each kernel exists to eliminate redundant HBM traffic that XLA's fusion
cannot always remove: multiple reductions / GEMMs over the *same* operands
are computed in one pass over memory.  All kernels run compiled on TPU and in
interpret mode elsewhere (so CPU unit tests exercise the identical code).

Kernel inventory (reference seams in parentheses):

- :func:`cg_dots` — the four per-iteration STPCG inner products
  ``<p,Hp>, <Hp,Hp>, <p,p>, <p,r>`` in a single read of (p, Hp, r)
  (``IterativeSolvers.h:294-341``).
- :func:`gram_pair` — ``S'A_S`` and ``S'B_S`` sharing one read of S
  (the LOBPCG Gram stage, ``LOBPCG.h:271-272``): S is streamed through VMEM
  once and both (k x k) Grams accumulate on-chip in float32.
- :func:`diag_stencil_matvec` — ``(diag(d) + 2I - shift - shift') v`` fused
  into one pass: reads d and v, writes the product — the speed-of-light
  traffic pattern for the benchmark's SPD Hv operator.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cg_dots", "diag_stencil_matvec", "gram_pair", "on_tpu"]

_LANES = 128
_SUBLANES = 8


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return not on_tpu()


def _pad_to(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    n = x.shape[0]
    rem = (-n) % mult
    if rem:
        x = jnp.concatenate([x, jnp.zeros((rem,), x.dtype)])
    return x


def _as_tiles(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Reshape a flat vector to (rows_total, 128), zero-padded."""
    x = _pad_to(x, rows * _LANES)
    return x.reshape(-1, _LANES)


# ---------------------------------------------------------------------------
# cg_dots
# ---------------------------------------------------------------------------


def _cg_dots_kernel(p_ref, hp_ref, r_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    p = p_ref[...].astype(jnp.float32)
    hp = hp_ref[...].astype(jnp.float32)
    r = r_ref[...].astype(jnp.float32)
    o_ref[0, 0] += jnp.sum(p * hp)
    o_ref[0, 1] += jnp.sum(hp * hp)
    o_ref[0, 2] += jnp.sum(p * p)
    o_ref[0, 3] += jnp.sum(p * r)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def cg_dots(p: jnp.ndarray, Hp: jnp.ndarray, r: jnp.ndarray,
            block_rows: int = 512) -> Tuple[jnp.ndarray, ...]:
    """``(<p,Hp>, <Hp,Hp>, <p,p>, <p,r>)`` in one pass over (p, Hp, r).

    Inputs are flat float arrays of equal length; accumulation is float32.
    """
    n = p.shape[0]
    tiles = max(1, -(-n // (_LANES * block_rows)))
    p2 = _as_tiles(p, block_rows * tiles)
    hp2 = _as_tiles(Hp, block_rows * tiles)
    r2 = _as_tiles(r, block_rows * tiles)
    rows = p2.shape[0]
    block_rows = min(block_rows, rows)
    grid = rows // block_rows

    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _cg_dots_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.float32),
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, 4), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        interpret=_interpret(),
    )(p2, hp2, r2)
    o = out[0].astype(p.dtype)
    return o[0], o[1], o[2], o[3]


# ---------------------------------------------------------------------------
# gram_pair
# ---------------------------------------------------------------------------


def _gram_pair_kernel(s_ref, as_ref, bs_ref, oa_ref, ob_ref, acc_a, acc_b):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_a[...] = jnp.zeros_like(acc_a)
        acc_b[...] = jnp.zeros_like(acc_b)

    st = s_ref[...].astype(jnp.float32).T
    acc_a[...] += jnp.dot(st, as_ref[...].astype(jnp.float32),
                          preferred_element_type=jnp.float32)
    acc_b[...] += jnp.dot(st, bs_ref[...].astype(jnp.float32),
                          preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        oa_ref[...] = acc_a[...]
        ob_ref[...] = acc_b[...]


@functools.partial(jax.jit, static_argnames=("block_rows",))
def gram_pair(S: jnp.ndarray, AS: jnp.ndarray, BS: jnp.ndarray,
              block_rows: int = 1024) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(S' AS, S' BS)`` sharing a single streaming read of S.

    S, AS, BS: (m, k) with k small (the LOBPCG basis width 3*nx).  Both Grams
    accumulate in float32 VMEM scratch; outputs are float32, symmetrized by
    the caller as needed.
    """
    m, k = S.shape

    def pad_rows(x):
        rem = (-m) % block_rows
        if rem:
            x = jnp.concatenate(
                [x, jnp.zeros((rem, k), x.dtype)], axis=0)
        return x

    Sp, ASp, BSp = pad_rows(S), pad_rows(AS), pad_rows(BS)
    grid = Sp.shape[0] // block_rows

    spec = pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((k, k), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    oa, ob = pl.pallas_call(
        _gram_pair_kernel,
        out_shape=(jax.ShapeDtypeStruct((k, k), jnp.float32),
                   jax.ShapeDtypeStruct((k, k), jnp.float32)),
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32),
                        pltpu.VMEM((k, k), jnp.float32)],
        interpret=_interpret(),
    )(Sp, ASp, BSp)
    return oa, ob


# ---------------------------------------------------------------------------
# diag_stencil_matvec
# ---------------------------------------------------------------------------


def _stencil_kernel(d_ref, v_ref, up_ref, down_ref, o_ref):
    d = d_ref[...]
    v = v_ref[...]
    o_ref[...] = (d + 2.0) * v - up_ref[...] - down_ref[...]


@jax.jit
def diag_stencil_matvec(d: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``(diag(d) + 2 I - S - S') v`` where S is the unit shift: the fused
    SPD "diag + 3-point stencil" operator of the benchmark Hv.

    One pass: reads d and v (the shifted reads hit the same cached v tiles),
    writes the product — 3 n words of HBM traffic, the roofline minimum.
    """
    n = v.shape[0]
    up = jnp.concatenate([v[1:], jnp.zeros((1,), v.dtype)])
    down = jnp.concatenate([jnp.zeros((1,), v.dtype), v[:-1]])

    rows = max(_SUBLANES, -(-n // _LANES))
    d2 = _as_tiles(d, rows)
    v2 = _as_tiles(v, rows)
    up2 = _as_tiles(up, rows)
    down2 = _as_tiles(down, rows)

    block_rows = min(1024, d2.shape[0])
    # Grid must tile exactly: pad rows to a multiple of block_rows
    total = d2.shape[0]
    rem = (-total) % block_rows
    if rem:
        z = jnp.zeros((rem, _LANES), v.dtype)
        d2, v2, up2, down2 = (jnp.concatenate([a, z]) for a in
                              (d2, v2, up2, down2))
        total += rem
    grid = total // block_rows

    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _stencil_kernel,
        out_shape=jax.ShapeDtypeStruct((total, _LANES), v.dtype),
        grid=(grid,),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(d2, v2, up2, down2)
    return out.reshape(-1)[:n]
