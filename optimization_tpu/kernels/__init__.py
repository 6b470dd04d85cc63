"""Pallas TPU kernels for the solver hot loops (SURVEY.md section 7.2, M6).

The reference's hot loops spend their time in three places (SURVEY.md
section 3): the STPCG/LSQR inner-product reductions, the LOBPCG block
Gram-matrix formation, and user operator applications.  XLA already fuses
most elementwise work into those; these kernels capture the remaining
HBM-bandwidth wins by fusing *multiple* reductions over the same operands
into a single memory pass:

- :func:`cg_dots` — the four STPCG per-iteration inner products in one read
  of (p, Hp, r);
- :func:`gram_pair` — ``S'(AS)`` and ``S'(BS)`` sharing one read of ``S``
  (the LOBPCG Rayleigh-Ritz Gram stage, reference ``LOBPCG.h:271-272``);
- :func:`diag_stencil_matvec` / :func:`affine_stencil_matvec` — fused
  ``diag + tridiagonal-stencil`` SPD matvecs (the benchmark Hv operator) at
  minimum HBM traffic (3n / 2n words);
- :func:`axpy_selfdot` — residual update fused with its norm;
- :func:`stream3_probe` — a stream-pattern-matched probe measuring the
  attainable read-read-write bandwidth (the roofline-model ceiling the
  benchmarks report against).

Caveat (measured): inside a large jitted loop the opaque ``pallas_call``
boundary blocks XLA's cross-op fusion, so locally-faster kernels can lose
end-to-end — see ``stpcg(fused_dots=...)``. The stencil matvecs win because
XLA materializes their pad/slice shifts.

Round 4 added the tier where Pallas wins decisively: the WHOLE-LOOP
streamed CG kernel (:mod:`streamed_cg` — :func:`stpcg_flat_streamed`)
owns the entire trust-region subproblem, pins the loop-invariant U base
vector in VMEM, and hand-schedules double-buffered DMA for s/r/p — 5n
real words/iteration at 0.80 of spec HBM in the > VMEM regime (1951 CG
it/s f32 n=2^24 vs 1359 for the best XLA body; 1.98x end-to-end on the
bf16 n=2^26 scale tier).  The design rule: Pallas pays when the kernel
owns a loop (residency + DMA schedule), not when it replaces single ops
inside XLA fusions.

Every kernel transparently falls back to interpret mode off-TPU, so the same
code path is unit-tested on CPU and compiled on hardware.
"""

from .fused import (affine_stencil_matvec, axpy_selfdot, cg_dots,
                    diag_stencil_matvec, gram_pair, on_tpu, stream3_probe)
from .streamed_cg import sphere_rayleigh_streamed, stpcg_flat_streamed

__all__ = ["affine_stencil_matvec", "axpy_selfdot", "cg_dots",
           "diag_stencil_matvec", "gram_pair", "on_tpu", "stream3_probe",
           "sphere_rayleigh_streamed", "stpcg_flat_streamed"]
