"""Batched small-matrix symmetric eigensolver: parallel-ordered cyclic Jacobi.

Why this exists (TPU-native design note): the fleet-batched LOBPCG iteration
(``linalg/lobpcg.py:lobpcg_fleet``) is bound by its two batched (3nx x 3nx)
Rayleigh-Ritz eigendecompositions — XLA's TPU ``eigh`` lowers to a QDWH
polar-decomposition program sized for *large* matrices, and a vmapped
16 x 48 x 48 batch costs ~8-10x a single 48 x 48 solve (measured on v5e,
benchmarks/config10).  This module solves the batch with the classic
SIMD-parallel two-sided Jacobi method instead.

**Measured verdict (round 3, v5e)**: inside the real fleet iteration the
Jacobi RR *loses* to batched QDWH — 19.4 ms vs 4.7 ms per lockstep fleet
iteration gross (benchmarks/probe_jacobi.py; ~18 vs ~4 ms after
subtracting the ~1 ms/iteration tunnel-dispatch charge its K=50
single-call methodology carries, so ~4.5-7x) — because its n-1 rotation rounds
x ~10 sweeps form a long sequential chain of tiny elementwise steps, and
this runtime's per-step loop overhead dominates the (small) per-round
work.  The module is retained as a standalone batched high-relative-
accuracy eigensolver (e.g. for graded spectra where QDWH's norm-relative
floor is the limiting factor — see the accuracy note below and
tests/test_jacobi.py), not as the fleet RR fast path; that role went to
the shifted-Cholesky whitening RR (``lobpcg._rayleigh_ritz_chol``), which
halves the eigh count instead of replacing the eigh.

Design (kept TPU-idiomatic even though QDWH wins at fleet sizes):

- **Brent-Luk parallel ordering**: pairs are always the adjacent index pairs
  (2i, 2i+1); between rotation rounds the matrix is conjugated by one FIXED
  position permutation (derived from the round-robin "circle method", see
  ``_tournament_perm``) whose n-1 iterates make every index pair adjacent
  exactly once per sweep.  The loop body is therefore identical every round:
  one diagonal/off-diagonal extraction, one batch of n/2 independent 2x2
  rotations applied as strided elementwise row/column updates, one constant
  ``take``.  No gathers with computed indices, no data-dependent control flow
  — exactly the shape XLA fuses well.
- **Elementwise only**: rotations are applied as (batch, n/2, 2, n) strided
  updates, so — unlike a matmul formulation — nothing routes through the MXU
  and the f32 carry is exact (no ``Precision.HIGHEST`` pinning needed).
- **Batched by construction**: every op broadcasts over leading batch dims;
  the whole fleet rotates in lockstep.  (Jacobi's rotation count does not
  depend on the data, only the sweep count does — lockstep batching is free.)

The reference has no counterpart (it defers to Eigen's selfadjoint solver,
e.g. ``LinearAlgebra/LOBPCG.h:53-62``); this is a hardware-motivated
replacement for the same mathematical step.

Accuracy: two-sided Jacobi is backward stable and attains high relative
accuracy on graded matrices (better than QR/QDWH); convergence is quadratic
once off-diagonal mass is small.  For n <= 64 in f32, 8-12 sweeps reach the
eps * ||A||_F floor; ``jacobi_eigh`` iterates sweeps under a while_loop with
an off-diagonal Frobenius test and a static sweep cap.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["jacobi_eigh"]


@lru_cache(maxsize=None)
def _tournament_perm(n: int) -> np.ndarray:
    """Fixed position permutation whose iterates enumerate all pairings.

    Arrangement space: a list L of n players with pairing (L[i], L[n-1-i])
    (round-robin circle method: L[0] fixed, the rest rotate one step per
    round).  The layout lam places pair i at adjacent positions (2i, 2i+1).
    The returned perm satisfies: new_A = old_A[perm][:, perm] advances one
    round, and over n-1 rounds every unordered index pair is adjacent
    exactly once (verified by direct simulation in tests/test_jacobi.py).
    """
    half = n // 2
    lam = np.empty(n, np.int32)
    for i in range(half):
        lam[i] = 2 * i
        lam[n - 1 - i] = 2 * i + 1
    lam_inv = np.argsort(lam)
    rho_src = np.empty(n, np.int32)
    rho_src[0] = 0
    rho_src[1] = n - 1
    for j in range(2, n):
        rho_src[j] = j - 1
    return lam[rho_src[lam_inv]].astype(np.int32)


def _round(A: jnp.ndarray, V: jnp.ndarray, perm: jnp.ndarray,
           reltol: float, floor: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One parallel rotation round: zero A[2i, 2i+1] for all i, then advance
    the pairing by the fixed tournament permutation.  Returns the per-instance
    "rotated anything" flag for the threshold-Jacobi convergence test."""
    n = A.shape[-1]
    half = n // 2
    batch = A.shape[:-2]

    # 2x2 pivots of the adjacent pairs (app = A[2i,2i], aqq = A[2i+1,2i+1]).
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)          # (..., n)
    app = diag[..., 0::2]                               # (..., half)
    aqq = diag[..., 1::2]
    # off-diagonal pivot A[2i, 2i+1]: diagonal of the (even rows, odd cols)
    # submatrix — a strided view, no computed-index gather.
    apq = jnp.diagonal(A[..., 0::2, 1::2], axis1=-2, axis2=-1)

    # Threshold-Jacobi pivot skip (Rutishauser): a pivot already negligible
    # RELATIVE to its diagonal pair is left alone — this is what buys high
    # relative accuracy on graded/equilibrated matrices (an absolute
    # ||A||-scaled criterion would stop while small eigenvalues still carry
    # O(eps ||A||) error).  The per-instance absolute floor handles zero
    # diagonals and bounds total work.
    small = ((jnp.abs(apq) <= reltol * jnp.sqrt(jnp.abs(app * aqq)))
             | (jnp.abs(apq) <= floor[..., None]))
    rotated = jnp.any(~small, axis=-1)                  # (...,)

    apq_safe = jnp.where(small, 1.0, apq)
    tau = (aqq - app) / (2.0 * apq_safe)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)       # tau==0 -> t=1 (45-degree)
    t = jnp.where(small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    # Left update J^T A: rows (2i, 2i+1) mix.  (..., half, 2, n) strided view.
    Ar = A.reshape(batch + (half, 2, n))
    r0, r1 = Ar[..., 0, :], Ar[..., 1, :]
    cs = c[..., None]
    sn = s[..., None]
    Ar = jnp.stack([cs * r0 - sn * r1, sn * r0 + cs * r1], axis=-2)
    A = Ar.reshape(batch + (n, n))

    # Right update (.)J: columns (2i, 2i+1) mix.  (..., n, half, 2) view.
    Ac = A.reshape(batch + (n, half, 2))
    c0, c1 = Ac[..., 0], Ac[..., 1]
    cs = c[..., None, :]
    sn = s[..., None, :]
    Ac = jnp.stack([cs * c0 - sn * c1, sn * c0 + cs * c1], axis=-1)
    A = Ac.reshape(batch + (n, n))

    Vc = V.reshape(batch + (n, half, 2))
    v0, v1 = Vc[..., 0], Vc[..., 1]
    Vc = jnp.stack([cs * v0 - sn * v1, sn * v0 + cs * v1], axis=-1)
    V = Vc.reshape(batch + (n, n))

    # Advance the tournament: conjugate by the fixed permutation.
    A = jnp.take(jnp.take(A, perm, axis=-1), perm, axis=-2)
    V = jnp.take(V, perm, axis=-1)
    return A, V, rotated


@partial(jax.jit, static_argnames=("max_sweeps", "sort"))
def jacobi_eigh(A: jnp.ndarray, *, max_sweeps: int = 12,
                tol: Optional[float] = None, sort: bool = True,
                v0: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of a (batch of) symmetric matrices by parallel
    cyclic Jacobi.

    - ``A``: (..., n, n) symmetric (symmetrized internally).  Any leading
      batch dims; all instances iterate in lockstep.
    - ``max_sweeps``: static cap on Jacobi sweeps (one sweep = n-1 parallel
      rotation rounds touching every off-diagonal entry once).
    - ``tol``: the Rutishauser threshold-Jacobi pivot cutoff (default
      ``eps(dtype)``): a pivot ``A[p,q]`` is rotated only while
      ``|A[p,q]| > tol * sqrt(|A[p,p] A[q,q]|)`` (relative — this is what
      buys high relative accuracy on graded spectra) and above the
      absolute floor ``tol * ||A||_F / n``.  Sweeping stops as soon as a
      full sweep performs no rotation in any instance.
    - Returns ``(w, V)``, eigenvalues ascending (when ``sort``) with
      ``A approx V diag(w) V^T`` and orthonormal V — same contract as
      ``jnp.linalg.eigh``.

    Odd n is padded internally with a decoupled sentinel eigenvalue that
    sorts last and is sliced away.

    ``v0`` optionally WARM-STARTS the solve with an (..., n, n) orthonormal
    seed (e.g. the previous iteration's eigenvectors in a lockstep
    eigensolver): A is conjugated to ``v0' A v0`` — near-diagonal when the
    seed is good, so the threshold sweeps converge in 1-2 sweeps instead
    of ~10 — and the returned V composes the seed back in.  NB measured on
    v5e at the fleet-RR shape (benchmarks/probe_warm_rr.py): even ONE
    Jacobi sweep costs more than the whole batched-QDWH eigh the fleet's
    chol-RR path runs, so warm-started Jacobi is NOT a fleet-RR win on
    this runtime; the seam is kept for per-op-cost runtimes and for
    standalone high-relative-accuracy tracking of slowly-varying pencils.
    """
    n_in = A.shape[-1]
    if v0 is not None:
        A = jnp.swapaxes(v0, -1, -2) @ A @ v0
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    dtype = A.dtype
    batch = A.shape[:-2]

    n = n_in + (n_in & 1)
    if n != n_in:
        # Pad with a decoupled diagonal entry above the Gershgorin bound of
        # every instance (sorts last; sliced off after the sweep loop).
        big = jnp.max(jnp.sum(jnp.abs(A), axis=-1), axis=-1) + 1.0
        pad = jnp.zeros(batch + (n, n), dtype)
        pad = pad.at[..., :n_in, :n_in].set(A)
        A = pad.at[..., n_in, n_in].set(big)

    if tol is None:
        tol = float(jnp.finfo(dtype).eps)

    perm = jnp.asarray(_tournament_perm(n))
    V0 = jnp.broadcast_to(jnp.eye(n, dtype=dtype), batch + (n, n))
    fro2 = jnp.sum(A * A, axis=(-2, -1))           # invariant under rotations
    # Per-instance absolute pivot floor: a pivot below fro/n^2 in magnitude
    # cannot move any eigenvalue by more than ~tol*fro in aggregate.
    floor = tol * jnp.sqrt(fro2) / float(n) + jnp.finfo(dtype).tiny

    def sweep_cond(carry):
        A, V, k, rotated = carry
        return (k < max_sweeps) & jnp.any(rotated)

    def sweep_body(carry):
        A, V, k, _ = carry

        def round_body(r, avr):
            A, V, rot = avr
            A, V, rotated = _round(A, V, perm, tol, floor)
            return A, V, rot | rotated

        A, V, rotated = jax.lax.fori_loop(
            0, n - 1, round_body,
            (A, V, jnp.zeros(batch, bool)))
        # One cheap resymmetrization per sweep controls roundoff drift
        # (rotations preserve symmetry exactly only in exact arithmetic).
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        return A, V, k + 1, rotated

    A, V, _, _ = jax.lax.while_loop(
        sweep_cond, sweep_body,
        (A, V0, jnp.zeros((), jnp.int32), jnp.ones(batch, bool)))

    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    if sort:
        order = jnp.argsort(w, axis=-1)
        w = jnp.take_along_axis(w, order, axis=-1)
        V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    w, V = w[..., :n_in], V[..., :n_in, :n_in]
    if v0 is not None:
        V = v0 @ V
    return w, V
