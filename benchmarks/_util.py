"""Shared benchmark harness utilities."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Single source of truth for the per-chip bandwidth table + lookup
from bench import HBM_GBPS, chip_bandwidth  # noqa: F401

from optimization_tpu.core.profiling import time_fn


def timeit(fn, iters=10, warmup=1):
    """Warmup-then-average wall timing (delegates to core.profiling)."""
    return time_fn(fn, iters=iters, warmup=warmup)


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 6),
        "unit": unit,
        "vs_baseline": round(float(vs_baseline), 4),
    }))


def materialize(out):
    """Force completion with a device->host transfer of one element per
    leaf (``jax.block_until_ready`` can return before the remote axon
    execution finishes — see core/profiling._materialize, same contract)."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def best_time(fn, *args, reps=3):
    """Compile/warm once, then best-of-``reps`` wall seconds per call
    (each call completion-forced via :func:`materialize`)."""
    materialize(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        materialize(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
