"""Test configuration: fake 8-device CPU mesh + float64.

The reference's tolerances (1e-6 .. 1e-8) assume double precision, so tests
run in x64 on CPU; multi-device sharding tests use the JAX "fake backend"
idiom (XLA_FLAGS=--xla_force_host_platform_device_count=8).  TPU execution is
covered by bench.py / examples on real hardware.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
