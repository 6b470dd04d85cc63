"""Host-chunked solve driver: wall-clock limits, verbose output, observers.

The reference checks a wall clock and prints a formatted line at the top of
every solver iteration (``TNT.h:447-471``, ``GradientDescent.h:231-253``,
``TNLS.h:491-506``, ``ProximalGradient.h:334-345``, ``ADMM.h:477-504``) and
stores per-iteration times in ``result.time[]`` (``Base/Concepts.h:76-80``).
A wall clock cannot live inside a compiled XLA loop, and the production TPU
runtime does not support JAX host callbacks — so this driver implements the
SURVEY.md section-7.1 design: run the jitted solver **K iterations per
dispatch**, read the clock / print / checkpoint *between* dispatches, and
stitch the per-chunk traces into a single reference-shaped result.

Chunking is exact, not approximate: every solver exposes a warm-start seam
(traced ``Delta0`` for TNT/TNLS, the ``warm_start`` tuples of
proximal-gradient and ADMM) that resumes the mathematical iteration with no
perturbation, so a chunked run visits bitwise the same iterates as a single
monolithic run of the same solver.  Each chunk reuses one compiled program
(chunk size and params are static; only the carried state changes).

Granularity of host facilities is the chunk: ``max_computation_time`` is
checked between chunks (the reference checks between iterations), and all
iterations in a chunk share the chunk-end timestamp in ``result.times``.
``chunk_iterations=1`` recovers exact per-iteration behavior;
``time_interpolation=True`` instead interpolates the timestamps linearly
across each chunk (reference-shaped monotone per-iteration times at zero
extra dispatches — an even-split model, since iterations inside one
compiled chunk genuinely share device time).

Cost model: every chunk boundary is a host-synchronized dispatch, whose
price is runtime-dependent — ~0.6 ms on a local PJRT runtime, but ~26-50
ms over the remote axon tunnel measured 2026-08-18 (docs/ROADMAP.md
measurement caveat).  Size ``chunk_iterations`` so per-chunk device work
dominates that charge; ``chunk_iterations=1`` is for semantics parity,
not throughput.
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple, Optional, Sequence

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .debug import pad_value

__all__ = ["drive", "drive_admm", "drive_lobpcg", "drive_lobpcg_fleet"]


class _Adapter(NamedTuple):
    run: Callable          # (x, carry, n_iters) -> result
    extract: Callable      # result -> (x, carry)
    pre_traces: Sequence[str]   # length n+1, recorded at top of iteration
    step_traces: Sequence[str]  # length n, recorded per attempted step
    iteration_limit: int   # status code meaning "ran out of iterations"
    elapsed_time: int      # status code for wall-clock stop
    fmt: Callable          # (result, i, k, prec) -> verbose line
    name: str = ""         # solver display name for the final report
    status_msg: dict = {}  # status code -> human explanation
    final_fields: Optional[Callable] = None  # result -> [(label, value)]


def _chunk_params(params, n: int):
    return dataclasses.replace(params, max_iterations=n)


def _print_summary(name, reason, fields, elapsed, precision):
    """Final status report (reference ``TNT.h:626-686``,
    ``GradientDescent.h:353-395``, ``TNLS.h:669-726``,
    ``ProximalGradient.h:412-445``, ``ADMM.h:597-620``): one line naming the
    termination reason, one line with the final values and elapsed time."""
    print(f"{name} terminated: {reason}", flush=True)
    parts = [f"{k}: {v:.{precision}e}" for k, v in fields]
    print("  " + "  ".join(parts + [f"elapsed: {elapsed:.3f} s"]), flush=True)


# Human explanations of the termination statuses, mirroring the reference's
# final-report branches (file:line above each dict).
_GD_STATUS_MSG = {  # GradientDescent.h:353-395
    1: "gradient norm tolerance reached",
    2: "relative decrease tolerance reached",
    3: "stepsize tolerance reached",
    4: "line search failed to find a step giving sufficient decrease",
    5: "iteration limit reached",
    6: "computation-time limit reached",
}
_TNT_STATUS_MSG = {  # TNT.h:626-686
    1: "gradient norm tolerance reached",
    2: "preconditioned gradient norm tolerance reached",
    3: "relative decrease tolerance reached",
    4: "stepsize tolerance reached",
    5: "trust-region radius collapsed below tolerance",
    6: "iteration limit reached",
    7: "computation-time limit reached",
    8: "user-supplied stopping criterion",
}
_TNLS_STATUS_MSG = {  # TNLS.h:669-726
    1: "root found: residual norm below tolerance",
    2: "gradient norm tolerance reached",
    3: "relative decrease tolerance reached",
    4: "stepsize tolerance reached",
    5: "trust-region radius collapsed below tolerance",
    6: "iteration limit reached",
    7: "computation-time limit reached",
    8: "user-supplied stopping criterion",
}
_PG_STATUS_MSG = {  # ProximalGradient.h:412-445
    1: "composite gradient tolerance reached",
    2: "iteration limit reached",
    3: "linesearch failed to find an acceptable stepsize",
    4: "computation-time limit reached",
    5: "user-supplied stopping criterion",
}
_ADMM_STATUS_MSG = {  # ADMM.h:597-620
    1: "primal and dual residual tolerances reached",
    2: "iteration limit reached",
    3: "computation-time limit reached",
    4: "user-supplied stopping criterion",
}


def _adapter_for(solver, problem, params, data, user_function):
    name = solver.__name__.rsplit(".", 1)[-1]

    if name == "gradient_descent":
        from ..core.types import GradientDescentStatus as S

        def run(x, carry, n):
            return solver.solve(problem, x, _chunk_params(params, n), data,
                                user_function=user_function)

        def fmt(r, i, k, p):
            return (f"Iter: {k:4d}  f: {r.objective_values[i]:+.{p}e}  "
                    f"|g|: {r.gradient_norms[i]:.{p}e}")

        return _Adapter(run, lambda r: (r.x, None),
                        ("objective_values", "gradient_norms"),
                        ("update_step_norms", "linesearch_iterations"),
                        S.ITERATION_LIMIT.value, S.ELAPSED_TIME.value, fmt,
                        "Gradient descent", _GD_STATUS_MSG,
                        lambda r: [("f", float(r.f)),
                                   ("|g|", float(r.gradfx_norm))])

    if name == "tnt":
        from ..core.types import TNTStatus as S

        def run(x, carry, n):
            return solver.solve(problem, x, _chunk_params(params, n), data,
                                user_function=user_function, Delta0=carry)

        def extract(r):
            return r.x, r.trust_region_radius[r.num_iterations]

        def fmt(r, i, k, p):
            return (f"Iter: {k:4d}  f: {r.objective_values[i]:+.{p}e}  "
                    f"|g|: {r.gradient_norms[i]:.{p}e}  "
                    f"Delta: {r.trust_region_radius[i]:.{p}e}")

        return _Adapter(run, extract,
                        ("objective_values", "gradient_norms",
                         "preconditioned_gradient_norms",
                         "trust_region_radius"),
                        ("inner_iterations", "update_step_norms",
                         "update_step_M_norms", "gain_ratios"),
                        S.ITERATION_LIMIT.value, S.ELAPSED_TIME.value, fmt,
                        "TNT", _TNT_STATUS_MSG,
                        lambda r: [("f", float(r.f)),
                                   ("|g|", float(r.gradfx_norm)),
                                   ("|M^-1 g|",
                                    float(r.preconditioned_grad_f_x_norm))])

    if name == "tnls":
        from ..core.types import TNLSStatus as S

        def run(x, carry, n):
            return solver.solve(problem, x, _chunk_params(params, n), data,
                                user_function=user_function, Delta0=carry)

        def extract(r):
            return r.x, r.trust_region_radius[r.num_iterations]

        def fmt(r, i, k, p):
            return (f"Iter: {k:4d}  |F|: {r.objective_values[i]:.{p}e}  "
                    f"|gradL|: {r.gradient_norms[i]:.{p}e}  "
                    f"Delta: {r.trust_region_radius[i]:.{p}e}")

        return _Adapter(run, extract,
                        ("objective_values", "gradient_norms",
                         "trust_region_radius"),
                        ("inner_iterations", "update_step_norms", "rho"),
                        S.ITERATION_LIMIT.value, S.ELAPSED_TIME.value, fmt,
                        "TNLS", _TNLS_STATUS_MSG,
                        lambda r: [("|F|", float(r.f)),
                                   ("|gradL|", float(r.gradfx_norm))])

    if name == "proximal_gradient":
        from ..core.types import ProximalGradientStatus as S

        def run(x, carry, n):
            return solver.solve(problem, x, _chunk_params(params, n), data,
                                warm_start=carry, user_function=user_function)

        def fmt(r, i, k, p):
            return (f"Iter: {k:4d}  F: {r.objective_values[i]:+.{p}e}  "
                    f"|G|: {r.composite_gradient_norms[i]:.{p}e}")

        return _Adapter(run, lambda r: (r.x, r.warm_start),
                        (),
                        ("objective_values", "composite_gradient_norms",
                         "relative_composite_gradient_norms",
                         "linesearch_iterations"),
                        S.ITERATION_LIMIT.value, S.ELAPSED_TIME.value, fmt,
                        "Proximal gradient", _PG_STATUS_MSG,
                        lambda r: [("F", float(r.f)),
                                   ("|G|", float(
                                       r.composite_gradient_norms[
                                           max(int(r.num_iterations) - 1, 0)])
                                    if int(r.num_iterations) else float("nan"))])

    raise ValueError(f"No driver adapter for solver module '{name}'")


def _stitch(results, counts, field, kind, total, final_extra):
    parts = [np.asarray(getattr(r, field))[:i] for r, i in zip(results, counts)]
    if kind == "pre" and final_extra:
        parts.append(np.asarray(getattr(results[-1], field))
                     [counts[-1]:counts[-1] + 1])
    flat = np.concatenate(parts) if parts else np.zeros((0,))
    n = total + (1 if kind == "pre" else 0)
    if np.issubdtype(flat.dtype, np.integer):
        out = np.zeros((n,), flat.dtype)
    else:
        out = np.full((n,), pad_value(), flat.dtype)
    out[:min(len(flat), n)] = flat[:n]
    return jnp.asarray(out)


def _fill_times(n_slots, counts, chunk_times, interpolate):
    """Per-iteration wall-clock vector from per-chunk end timestamps.

    Default: every iteration of a chunk carries the chunk-end timestamp
    (the documented granularity deviation from the reference's
    per-iteration stopwatch, ``Util/Stopwatch.h:15-29`` via
    ``TNT.h:454-459``).  With ``interpolate=True`` the timestamps are
    linearly interpolated across each chunk between the previous and
    current chunk ends — reference-shaped per-iteration times without
    paying the per-iteration dispatch charge of ``chunk_iterations=1``
    (iterations inside one compiled chunk genuinely share device time, so
    the interpolated values are an even-split model, labeled as such)."""
    times = np.full((n_slots,), pad_value(), np.float32)
    pos, prev = 0, 0.0
    for i, t in zip(counts, chunk_times):
        if interpolate and i > 0:
            times[pos:pos + i] = prev + (t - prev) * (
                np.arange(1, i + 1, dtype=np.float32) / i)
        else:
            times[pos:pos + i] = t
        pos += i
        prev = t
    return times, pos


def _drive(adapter: _Adapter, params, chunk_iterations, observer,
           checkpoint_path, x0, time_interpolation=False):
    verbose = params.verbose
    if chunk_iterations is None:
        chunk_iterations = 1 if verbose else max(1, params.max_iterations // 10)
    chunk_iterations = min(chunk_iterations, max(params.max_iterations, 1))

    start = time.monotonic()
    results, counts, chunk_times = [], [], []
    x, carry = x0, None
    done = 0
    final_status = None

    while True:
        n = min(chunk_iterations, params.max_iterations - done)
        if n <= 0:
            final_status = adapter.iteration_limit
            if not results:
                # max_iterations == 0: mirror the monolithic solver (one
                # zero-iteration run records the initial trace entry)
                r = adapter.run(x, carry, 0)
                results.append(r)
                counts.append(0)
                chunk_times.append(time.monotonic() - start)
            break
        r = adapter.run(x, carry, n)
        jax.block_until_ready(r.x)
        t = time.monotonic() - start
        i = int(r.num_iterations)
        status = int(r.status)
        results.append(r)
        counts.append(i)
        chunk_times.append(t)
        x, carry = adapter.extract(r)

        if verbose:
            for j in range(i):
                print(adapter.fmt(r, j, done + j, params.precision)
                      + f"  time: {t:.3f}", flush=True)
        if observer is not None:
            observer(done + i, r, t)
        if checkpoint_path is not None:
            from .checkpoint import save_pytree
            save_pytree(checkpoint_path, (x, carry))

        done += i
        if status != adapter.iteration_limit:
            final_status = status
            break
        if t > params.max_computation_time:
            final_status = adapter.elapsed_time
            break
        if done >= params.max_iterations:
            final_status = adapter.iteration_limit
            break

    last = results[-1]
    total = done
    # Reference-shaped stitched traces: each chunk contributes its completed
    # iterations; the final chunk additionally contributes its closing record.
    final_extra = True
    updates = {}
    for f in adapter.pre_traces:
        updates[f] = _stitch(results, counts, f, "pre", params.max_iterations,
                             final_extra)
    for f in adapter.step_traces:
        updates[f] = _stitch(results, counts, f, "step",
                             params.max_iterations, False)
    if params.log_iterates and getattr(last, "iterates", None) is not None:
        sliced = [jax.tree_util.tree_map(lambda l, n=i: l[:n], r.iterates)
                  for r, i in zip(results, counts)]
        sliced.append(jax.tree_util.tree_map(
            lambda l: l[counts[-1]:counts[-1] + 1], last.iterates))
        updates["iterates"] = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs)[:params.max_iterations + 1],
            *sliced)
    # times: chunk-end timestamps, optionally interpolated (_fill_times)
    times, pos = _fill_times(
        params.max_iterations + (1 if adapter.pre_traces else 0),
        counts, chunk_times, time_interpolation)
    if pos < len(times):
        times[pos] = chunk_times[-1]
    updates["times"] = jnp.asarray(times)

    result = last._replace(
        num_iterations=jnp.asarray(total, jnp.int32),
        status=jnp.asarray(final_status, jnp.int32),
        **updates)
    if verbose and adapter.final_fields is not None:
        _print_summary(
            adapter.name,
            adapter.status_msg.get(final_status, str(final_status)),
            adapter.final_fields(result), chunk_times[-1], params.precision)
    return result


def drive(solver, problem, x0, params, data=None, *,
          user_function=None, chunk_iterations: Optional[int] = None,
          observer: Optional[Callable[..., None]] = None,
          checkpoint_path: Optional[str] = None,
          time_interpolation: bool = False):
    """Run ``solver.solve`` in host-driven chunks.

    - ``solver``: one of the solver modules ``gradient_descent`` / ``tnt`` /
      ``tnls`` / ``proximal_gradient`` (for ADMM use :func:`drive_admm`).
    - Honors ``params.max_computation_time`` (checked between chunks; status
      becomes the solver's ElapsedTime code, reference ``TNT.h:447-451``),
      ``params.verbose`` (per-iteration lines printed per chunk, reference
      ``TNT.h:464-471``), and fills ``result.times``.
    - ``observer(total_iters, chunk_result, elapsed)`` is the host-side analog
      of the reference's void user functions (observation only).
    - ``checkpoint_path``: if given, the warm-start state is serialized after
      every chunk (crash-resumable long solves).
    - ``chunk_iterations``: dispatch granularity; defaults to 1 when verbose,
      else max_iterations/10.
    - ``time_interpolation``: linearly interpolate ``result.times`` across
      each chunk (reference-shaped per-iteration timestamps without the
      per-iteration dispatch charge of ``chunk_iterations=1``); default
      False keeps the documented chunk-end-timestamp granularity.

    Returns the same result type as ``solver.solve``, with stitched traces
    identical to a monolithic run.
    """
    adapter = _adapter_for(solver, problem, params, data, user_function)
    return _drive(adapter, params, chunk_iterations, observer,
                  checkpoint_path, x0, time_interpolation)


def drive_admm(problem, c, x0, y0, params, data=None, *,
               user_function=None,
               chunk_iterations: Optional[int] = None,
               observer: Optional[Callable[..., None]] = None,
               checkpoint_path: Optional[str] = None,
               time_interpolation: bool = False):
    """Host-chunked ADMM (see :func:`drive`).  Resumes via the solver's
    ``warm_start`` seam, so acceleration/penalty state carries exactly.
    ``user_function`` is the solver's terminating jittable predicate
    (``admm.solve``); at ``chunk_iterations=1`` the chunk result seen by
    ``observer`` additionally carries the reference callback's residual
    VECTORS ``r``/``s`` per iteration (``ADMM.h:71-76``)."""
    from ..core.types import ADMMStatus as S
    from ..solvers import admm

    verbose = params.verbose
    if chunk_iterations is None:
        chunk_iterations = 1 if verbose else max(1, params.max_iterations // 10)

    start = time.monotonic()
    results, counts, chunk_times = [], [], []
    x, y, ws = x0, y0, None
    done = 0
    final_status = None

    while True:
        n = min(chunk_iterations, params.max_iterations - done)
        if n <= 0:
            final_status = S.ITERATION_LIMIT.value
            if not results:
                p = dataclasses.replace(params, max_iterations=0)
                r = admm.solve(problem, c, x, y, p, data, warm_start=ws,
                               user_function=user_function)
                results.append(r)
                counts.append(0)
                chunk_times.append(time.monotonic() - start)
            break
        p = dataclasses.replace(params, max_iterations=n)
        r = admm.solve(problem, c, x, y, p, data, warm_start=ws,
                       user_function=user_function)
        jax.block_until_ready(r.x)
        t = time.monotonic() - start
        i = int(r.num_iterations)
        results.append(r)
        counts.append(i)
        chunk_times.append(t)
        x, ws = r.x, r.warm_start
        y = ws[2]["y_prev"]  # the internal (plain) y

        if verbose:
            for j in range(i):
                print(f"Iter: {done + j:4d}  "
                      f"|r|: {r.primal_residuals[j]:.{params.precision}e}  "
                      f"|s|: {r.dual_residuals[j]:.{params.precision}e}  "
                      f"rho: {r.penalty_parameters[j]:.{params.precision}e}"
                      f"  time: {t:.3f}", flush=True)
        if observer is not None:
            observer(done + i, r, t)
        if checkpoint_path is not None:
            from .checkpoint import save_pytree
            save_pytree(checkpoint_path, (x, y, ws))

        done += i
        if int(r.status) != S.ITERATION_LIMIT.value:
            final_status = int(r.status)
            break
        if t > params.max_computation_time:
            final_status = S.ELAPSED_TIME.value
            break
        if done >= params.max_iterations:
            final_status = S.ITERATION_LIMIT.value
            break

    last = results[-1]
    updates = {}
    for f in ("primal_residuals", "dual_residuals", "m_k",
              "penalty_parameters", "iteration_types"):
        updates[f] = _stitch(results, counts, f, "step",
                             params.max_iterations, False)
    if params.log_iterates and getattr(last, "iterates", None) is not None:
        sliced = [jax.tree_util.tree_map(lambda l, n=i: l[:n], r.iterates)
                  for r, i in zip(results, counts)]

        def cat(*xs):
            flat = jnp.concatenate(xs)
            pad = params.max_iterations - flat.shape[0]
            if pad > 0:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)])
            return flat

        updates["iterates"] = jax.tree_util.tree_map(cat, *sliced)
    times, _ = _fill_times(params.max_iterations, counts, chunk_times,
                           time_interpolation)
    updates["times"] = jnp.asarray(times)

    result = last._replace(
        num_iterations=jnp.asarray(done, jnp.int32),
        status=jnp.asarray(final_status, jnp.int32),
        **updates)
    if verbose:
        _print_summary(
            "ADMM", _ADMM_STATUS_MSG.get(final_status, str(final_status)),
            [("primal residual", float(result.primal_residuals[max(done - 1, 0)])
              if done else float("nan")),
             ("dual residual", float(result.dual_residuals[max(done - 1, 0)])
              if done else float("nan"))],
            chunk_times[-1], params.precision)
    return result


def _drive_lobpcg_loop(run_chunk, *, iters_of, converged, verbose_line,
                       summarize, fleet, nev, max_iterations,
                       max_computation_time, verbose, precision,
                       chunk_iterations, observer, checkpoint_path,
                       time_interpolation=False):
    """Shared chunk loop / trace stitching for :func:`drive_lobpcg` and
    :func:`drive_lobpcg_fleet` (they differ only in the solver call, the
    per-iteration verbose aggregate, the converged test, and whether the
    traces carry a leading fleet axis)."""
    if max_iterations < 1:
        raise ValueError("max_iterations must be >= 1")
    if chunk_iterations is None:
        chunk_iterations = 1 if verbose else max(1, max_iterations // 10)
    chunk_iterations = min(chunk_iterations, max(max_iterations, 1))

    start = time.monotonic()
    results, counts, chunk_times = [], [], []
    ws = None
    done = 0
    timed_out = False

    while True:
        n = min(chunk_iterations, max_iterations - done)
        if n <= 0:
            break
        r = run_chunk(n, ws)
        jax.block_until_ready(r.X)
        t = time.monotonic() - start
        i = iters_of(r) - done   # iterations completed this chunk
        results.append(r)
        counts.append(i)
        chunk_times.append(t)
        ws = r.warm_start

        if verbose:
            for j in range(i):
                print(verbose_line(r, j, done + j, t), flush=True)
        if observer is not None:
            observer(done + i, r, t)
        if checkpoint_path is not None:
            from .checkpoint import save_pytree
            save_pytree(checkpoint_path, ws)

        done += i
        if converged(r) or i < n:
            break
        if t > max_computation_time:
            timed_out = True
            break

    last = results[-1]
    shape = (max_iterations,) if fleet is None else (fleet, max_iterations)
    res_trace = np.full(shape, pad_value(), np.float32)
    nc_trace = np.full(shape, -1, np.int32)
    times, _ = _fill_times(max_iterations, counts, chunk_times,
                           time_interpolation)
    pos = 0
    for r, i, t in zip(results, counts, chunk_times):
        res_trace[..., pos:pos + i] = np.asarray(r.residual_trace)[..., :i]
        nc_trace[..., pos:pos + i] = np.asarray(r.nc_trace)[..., :i]
        pos += i

    result = last._replace(residual_trace=jnp.asarray(res_trace),
                           nc_trace=jnp.asarray(nc_trace))
    if verbose:
        name, reason, fields = summarize(result, timed_out)
        _print_summary(name, reason, fields, chunk_times[-1], precision)
    return result, jnp.asarray(times)


def drive_lobpcg(A, B=None, T=None, *, X0=None, m=None, nx=None, nev,
                 max_iterations=100, tau=1e-6, key=None,
                 max_computation_time=float("inf"), verbose=False,
                 precision=3, chunk_iterations: Optional[int] = None,
                 observer: Optional[Callable[..., None]] = None,
                 checkpoint_path: Optional[str] = None,
                 time_interpolation: bool = False):
    """Host-chunked standalone LOBPCG (the reference's public front-end,
    ``LinearAlgebra/LOBPCG.h:131-140``): wall-clock limit, per-iteration
    verbose lines, times, and a final status report, via the solver's
    ``warm_start`` seam (chunked == monolithic iterates exactly).

    Returns ``(result, times)``: the stitched LOBPCGResult (with
    ``residual_trace``/``nc_trace`` covering all completed iterations) and
    the per-iteration chunk-end timestamps.
    """
    from ..linalg.lobpcg import lobpcg

    def run_chunk(n, ws):
        return lobpcg(A, B, T, X0=X0, m=m, nx=nx, nev=nev, max_iterations=n,
                      tau=tau, key=key, warm_start=ws)

    def verbose_line(r, j, k, t):
        return (f"Iter: {k:4d}  max|r|: "
                f"{float(r.residual_trace[j]):.{precision}e}  "
                f"nc: {int(r.nc_trace[j])}  time: {t:.3f}")

    def summarize(result, timed_out):
        nc = int(result.num_converged)
        reason = ("computation-time limit reached" if timed_out else
                  f"{nc}/{nev} wanted eigenpairs converged" if nc >= nev
                  else "iteration limit reached")
        return "LOBPCG", reason, [
            ("max residual", float(np.max(np.asarray(
                result.residual_norms)))),
            ("theta_0", float(result.theta[0]))]

    return _drive_lobpcg_loop(
        run_chunk, iters_of=lambda r: int(r.num_iterations),
        converged=lambda r: int(r.num_converged) >= nev,
        verbose_line=verbose_line, summarize=summarize, fleet=None,
        nev=nev, max_iterations=max_iterations,
        max_computation_time=max_computation_time, verbose=verbose,
        precision=precision, chunk_iterations=chunk_iterations,
        observer=observer, checkpoint_path=checkpoint_path,
        time_interpolation=time_interpolation)


def drive_lobpcg_fleet(A, data, *, B=None, T=None, X0=None, m=None, nx=None,
                       nev, max_iterations=100, tau=1e-6, key=None,
                       rr_method="chol",
                       max_computation_time=float("inf"), verbose=False,
                       precision=3, chunk_iterations: Optional[int] = None,
                       observer: Optional[Callable[..., None]] = None,
                       checkpoint_path: Optional[str] = None,
                       time_interpolation: bool = False):
    """Host-chunked fleet LOBPCG: :func:`drive_lobpcg`'s host facilities
    (wall-clock limit, verbose lines, observers, crash checkpoints) for
    ``linalg.lobpcg.lobpcg_fleet`` — long certification / spectral-init
    sweeps get the same operational envelope as single solves.  The fleet
    iterates in lockstep; chunking resumes through the batched
    ``warm_start`` seam (chunked == monolithic iterates exactly).

    Verbose lines report fleet-wide aggregates (worst residual, least-
    converged instance); the final summary counts fully-converged
    instances.  Returns ``(result, times)`` with a leading fleet axis on
    every result field and the stitched traces of shape
    ``(fleet, total_iterations)``.
    """
    from ..linalg.lobpcg import lobpcg_fleet

    fleet = jax.tree_util.tree_leaves(data)[0].shape[0]

    def run_chunk(n, ws):
        return lobpcg_fleet(A, data, B=B, T=T, X0=X0, m=m, nx=nx, nev=nev,
                            max_iterations=n, tau=tau, key=key,
                            rr_method=rr_method, warm_start=ws)

    def verbose_line(r, j, k, t):
        # Instances that converged earlier stop recording (their trace
        # rows are NaN / -1 past their own count): aggregate over the
        # still-recording instances only.
        worst = float(jnp.nanmax(r.residual_trace[:, j]))
        ncj = r.nc_trace[:, j]
        least = int(jnp.min(jnp.where(ncj < 0, nev, ncj)))
        return (f"Iter: {k:4d}  fleet max|r|: "
                f"{worst:.{precision}e}  min nc: {least}  time: {t:.3f}")

    def summarize(result, timed_out):
        n_done = int(jnp.sum(result.num_converged >= nev))
        reason = ("computation-time limit reached" if timed_out else
                  f"{n_done}/{fleet} instances fully converged"
                  if n_done == fleet else "iteration limit reached")
        return "LOBPCG fleet", reason, [
            ("worst residual", float(jnp.max(result.residual_norms))),
            ("min nc", float(jnp.min(result.num_converged)))]

    return _drive_lobpcg_loop(
        run_chunk,
        # lockstep: every instance reports the same iteration count
        iters_of=lambda r: int(jnp.max(r.num_iterations)),
        converged=lambda r: bool(jnp.all(r.num_converged >= nev)),
        verbose_line=verbose_line, summarize=summarize, fleet=fleet,
        nev=nev, max_iterations=max_iterations,
        max_computation_time=max_computation_time, verbose=verbose,
        precision=precision, chunk_iterations=chunk_iterations,
        observer=observer, checkpoint_path=checkpoint_path,
        time_interpolation=time_interpolation)
