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
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["affine_stencil_matvec", "axpy_selfdot", "cg_dots",
           "diag_stencil_matvec", "gram_pair", "on_tpu", "stream3_probe"]

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
        # SMEM accepts scalar stores only: initialize slot by slot
        o_ref[0, 0] = 0.0
        o_ref[0, 1] = 0.0
        o_ref[0, 2] = 0.0
        o_ref[0, 3] = 0.0

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


def _axpy_selfdot_kernel(alpha_ref, x_ref, y_ref, o_ref, dot_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dot_ref[0, 0] = 0.0

    out = alpha_ref[0, 0] * x_ref[...] + y_ref[...]
    o_ref[...] = out
    out32 = out.astype(jnp.float32)
    dot_ref[0, 0] += jnp.sum(out32 * out32)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def axpy_selfdot(alpha, x: jnp.ndarray, y: jnp.ndarray,
                 block_rows: int = 2048):
    """``out = alpha*x + y`` and ``<out, out>`` in one pass (the STPCG
    residual update + its preconditioned norm, ``IterativeSolvers.h:380-408``
    for the identity preconditioner).  ``alpha`` may be a traced scalar."""
    n = x.shape[0]
    tiles = max(1, -(-n // (_LANES * block_rows)))
    x2 = _as_tiles(x, block_rows * tiles)
    y2 = _as_tiles(y, block_rows * tiles)
    rows = x2.shape[0]
    block_rows = min(block_rows, rows)
    grid = rows // block_rows

    a = jnp.asarray(alpha, x.dtype).reshape(1, 1)
    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out, dot = pl.pallas_call(
        _axpy_selfdot_kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, _LANES), x.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=(spec, pl.BlockSpec((1, 1), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)),
        interpret=_interpret(),
    )(a, x2, y2)
    return out.reshape(-1)[:n], dot[0, 0].astype(x.dtype)


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


def _neighbors(B, first, last):
    """Flat +-1 neighbors of a (BR, 128) row-major block view, built entirely
    in VMEM: lane shifts with row carry; ``first``/``last`` are the adjacent
    blocks' boundary elements."""
    br = B.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, B.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)

    # up[i] = v[i+1]: lanes left by one; lane 127 takes the next row's lane 0,
    # whose final row comes from the next block's first element.  Slice the
    # carry column *before* rolling so the row-roll is (br, 1), not (br, 128).
    up = pltpu.roll(B, _LANES - 1, 1)  # left by 1 == right by size-1
    col_next = pltpu.roll(B[:, 0:1], br - 1, 0)
    col_next = jnp.where(row == br - 1, first, col_next)
    up = jnp.where(lane == _LANES - 1, col_next, up)

    # down[i] = v[i-1]: lanes right by one; lane 0 takes the previous row's
    # lane 127, whose first row comes from the previous block's last element.
    down = pltpu.roll(B, 1, 1)
    col_prev = pltpu.roll(B[:, _LANES - 1:_LANES], 1, 0)
    col_prev = jnp.where(row == 0, last, col_prev)
    down = jnp.where(lane == 0, col_prev, down)
    return up, down


def _stencil_kernel(first_ref, last_ref, d_ref, v_ref, o_ref, *, scale):
    i = pl.program_id(0)
    B = v_ref[...]
    up, down = _neighbors(B, first_ref[i], last_ref[i])
    o_ref[...] = ((d_ref[...] + 2.0) * B - up - down) * scale


def _affine_stencil_kernel(first_ref, last_ref, v_ref, o_ref, *,
                           a, b, scale, block_rows):
    # d[g] = a + b*g generated on the VPU from the global flat index — the
    # matrix-free variant: HBM traffic is exactly read-v + write-out (2n).
    # The flat index g = (i*BR + row)*128 + lane separates into a (br, 1) row
    # part and a (1, 128) lane part, so the only full-width index op is one
    # broadcast add (the kernel is VPU-bound; full-width iotas are costly).
    i = pl.program_id(0)
    B = v_ref[...]
    br = B.shape[0]
    up, down = _neighbors(B, first_ref[i], last_ref[i])
    row = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    d_row = (a + 2.0) + b * ((i * block_rows + row) * _LANES).astype(B.dtype)
    d = d_row + b * lane.astype(B.dtype)  # == d + 2, broadcast to (br, 128)
    o_ref[...] = (d * B - up - down) * scale


@functools.partial(jax.jit, static_argnames=("scale", "block_rows"))
def diag_stencil_matvec(d: jnp.ndarray, v: jnp.ndarray, *,
                        scale: float = 1.0,
                        block_rows: int = 2048) -> jnp.ndarray:
    """``scale * (diag(d) + 2 I - S - S') v`` where S is the unit shift: the
    fused SPD "diag + 3-point stencil" operator of the benchmark Hv.

    One pass: reads d and v, writes the product — 3n words of HBM traffic,
    the roofline minimum.  Cross-block halo elements travel through two tiny
    side arrays (one scalar per block), not extra passes over v.
    """
    n = v.shape[0]
    rows = max(_SUBLANES, -(-n // _LANES))
    d2 = _as_tiles(d, rows)
    v2 = _as_tiles(v, rows)

    total = d2.shape[0]
    block_rows = min(block_rows, total)
    rem = (-total) % block_rows
    if rem:
        z = jnp.zeros((rem, _LANES), v.dtype)
        d2, v2 = jnp.concatenate([d2, z]), jnp.concatenate([v2, z])
        total += rem
    grid = total // block_rows
    C = block_rows * _LANES  # elements per block
    firsts, lasts = _boundaries(v2, grid, C, total, v.dtype)

    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    # Whole boundary arrays resident in SMEM; indexed by program_id in-kernel
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_stencil_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((total, _LANES), v.dtype),
        grid=(grid,),
        in_specs=[scalar_spec, scalar_spec, spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(firsts, lasts, d2, v2)
    return out.reshape(-1)[:n]


def _copy3_kernel(d_ref, v_ref, o_ref, *, scale):
    o_ref[...] = (d_ref[...] + 2.0) * v_ref[...] * scale


@functools.partial(jax.jit, static_argnames=("scale", "block_rows"))
def stream3_probe(d: jnp.ndarray, v: jnp.ndarray, *, scale: float = 1.0,
                  block_rows: int = 2048) -> jnp.ndarray:
    """Minimal read-read-write kernel with the same stream pattern, block
    geometry, and pipeline as :func:`diag_stencil_matvec` but no stencil
    work — benchmarks use it to measure the *achievable* 3-stream HBM rate
    (the roofline-model ceiling for this traffic pattern), against which the
    real kernel's throughput is reported."""
    n = v.shape[0]
    rows = max(_SUBLANES, -(-n // _LANES))
    d2 = _as_tiles(d, rows)
    v2 = _as_tiles(v, rows)
    total = d2.shape[0]
    block_rows = min(block_rows, total)
    rem = (-total) % block_rows
    if rem:
        z = jnp.zeros((rem, _LANES), v.dtype)
        d2, v2 = jnp.concatenate([d2, z]), jnp.concatenate([v2, z])
        total += rem
    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_copy3_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((total, _LANES), v.dtype),
        grid=(total // block_rows,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(d2, v2)
    return out.reshape(-1)[:n]


def _boundaries(v2, grid, C, total, dtype):
    """firsts[b] = first element of block b+1; lasts[b] = last of block b-1
    (zero at the edges) — the cross-block stencil halo as two tiny arrays."""
    vf = v2.reshape(-1)
    starts = jnp.arange(1, grid + 1) * C
    firsts = jnp.where(starts < total * _LANES,
                       vf[starts % (total * _LANES)], 0.0).astype(dtype)
    ends = jnp.arange(0, grid) * C - 1
    lasts = jnp.where(ends >= 0, vf[ends], 0.0).astype(dtype)
    return firsts, lasts


@functools.partial(jax.jit,
                   static_argnames=("a", "b", "scale", "block_rows"))
def affine_stencil_matvec(v: jnp.ndarray, *, a: float, b: float,
                          scale: float = 1.0,
                          block_rows: int = 2048) -> jnp.ndarray:
    """``scale * (diag(a + b*i) + 2 I - S - S') v`` — the *matrix-free*
    variant of :func:`diag_stencil_matvec`: the affine diagonal is generated
    on the VPU from the flat index, so HBM traffic is exactly one read of v
    and one write of the product (2n words — the speed-of-light pattern for
    any SPD matvec).
    """
    n = v.shape[0]
    rows = max(_SUBLANES, -(-n // _LANES))
    v2 = _as_tiles(v, rows)
    total = v2.shape[0]
    block_rows = min(block_rows, total)
    rem = (-total) % block_rows
    if rem:
        v2 = jnp.concatenate([v2, jnp.zeros((rem, _LANES), v.dtype)])
        total += rem
    grid = total // block_rows
    C = block_rows * _LANES
    firsts, lasts = _boundaries(v2, grid, C, total, v.dtype)

    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_affine_stencil_kernel, a=a, b=b, scale=scale,
                          block_rows=block_rows),
        out_shape=jax.ShapeDtypeStruct((total, _LANES), v.dtype),
        grid=(grid,),
        in_specs=[scalar_spec, scalar_spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(firsts, lasts, v2)
    return out.reshape(-1)[:n]
