"""Shared benchmark harness utilities."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Known HBM bandwidths (GB/s) per chip generation (public spec sheets).
HBM_GBPS = {
    "v5 lite": 819.0,   # TPU v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,       # Trillium
    "cpu": 50.0,        # nominal, so benchmarks still run off-TPU
}


def chip_bandwidth():
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return bw, kind
    return HBM_GBPS["cpu"], kind


def timeit(fn, iters=10, warmup=1):
    """Median-free simple wall timing: warmup, then average over iters."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 6),
        "unit": unit,
        "vs_baseline": round(float(vs_baseline), 4),
    }))
