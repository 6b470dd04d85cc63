"""Shared example harness: backend selection + result pretty-printing."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _backend_alive(timeout: float = 240) -> bool:
    """Probe backend init (subprocess + success cache): a dead TPU tunnel
    makes jax.devices() block forever.  Shared with bench.py."""
    from bench import backend_alive
    return backend_alive(timeout)


def setup(platform: str | None = None, n_cpu_devices: int | None = None,
          x64: bool | None = None):
    """Pin the backend.  NB: JAX env vars are useless here (a sitecustomize
    imports jax at interpreter start); only dynamic config works.  The
    OPTTPU_PLATFORM env var (ours, read here before jax initializes a
    backend) overrides the default platform, e.g. OPTTPU_PLATFORM=cpu.
    """
    platform = platform or os.environ.get("OPTTPU_PLATFORM") or None
    if platform not in ("cpu",) and not _backend_alive():
        sys.exit("backend initialization hung — TPU tunnel outage?  "
                 "Re-run later, or run this example on CPU with "
                 "OPTTPU_PLATFORM=cpu.")
    if platform:
        jax.config.update("jax_platforms", platform)
    if n_cpu_devices:
        jax.config.update("jax_num_cpu_devices", n_cpu_devices)
    if x64 is None:
        x64 = jax.default_backend() == "cpu"
    if x64:
        jax.config.update("jax_enable_x64", True)
    # Trust-region gain ratios and backtracking line searches compare objective
    # values to ~1e-7 relative precision; the TPU MXU's default bf16 matmul
    # inputs are too coarse for that, so examples run matmuls at full f32.
    jax.config.update("jax_default_matmul_precision", "highest")
    print(f"backend={jax.default_backend()} devices={jax.devices()}")


def report(name, res, t0, extra=""):
    print(f"[{name}] status={int(res.status)} iters={int(res.num_iterations)}"
          f" f={float(res.f):.6e} wall={time.time() - t0:.2f}s {extra}")
