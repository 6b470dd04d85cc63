"""Test configuration: fake 8-device CPU mesh + float64.

The reference's tolerances (1e-6 .. 1e-8) assume double precision, so tests
run in x64 on CPU; multi-device sharding tests use the JAX "fake backend"
idiom (8 virtual CPU devices).  TPU execution is covered by bench.py /
examples on real hardware.

NB: this environment preloads the axon TPU plugin via a sitecustomize .pth,
which imports jax at interpreter start — environment variables like
JAX_PLATFORMS / XLA_FLAGS are therefore already consumed.  The dynamic
``jax.config.update`` calls below are the only reliable way to pin the
backend.  Do NOT enable jax_compilation_cache_dir: the persistent compile
cache deadlocks the first jit in this JAX build.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The full suite compiles many hundreds of XLA CPU programs; letting the
    JIT'd code accumulate across all ~20 modules reproducibly segfaults
    the XLA CPU compiler late in the run (observed twice at ~78%, in
    whatever small compile came next — an upstream accumulation bug, not
    a test failure; 125 GB host RAM free at the time).  Per-module cache
    clearing bounds the live compiled-program count at no measurable
    wall-clock cost (modules share almost no programs)."""
    yield
    jax.clear_caches()
