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
