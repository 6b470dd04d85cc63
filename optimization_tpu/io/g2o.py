"""g2o pose-graph loader: native C++ parser with pure-Python fallback.

The reference suite is the solver engine behind SE-Sync-style rotation/pose
synchronization; the de-facto interchange format for those problems is g2o.
The hot path is a C++ parser (``native/g2o_loader.cpp``, built to
``libg2o_loader.so`` by ``make -C native``) driven through ctypes — the
framework's native data-loader tier.  When the shared library is missing the
pure-Python parser below produces identical arrays (tests assert parity).

Returned :class:`PoseGraph` feeds directly into
``optimization_tpu.models.rotation_sync`` (src/dst/Rij) and carries
translations + rotational information weights for downstream SE-Sync use.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from typing import NamedTuple, Optional

import numpy as np

__all__ = ["PoseGraph", "load_g2o", "native_available", "build_native"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libg2o_loader.so")

_lib = None


class PoseGraph(NamedTuple):
    n_vertices: int
    dim: int               # 2 or 3
    src: np.ndarray        # (E,) int32
    dst: np.ndarray        # (E,) int32
    Rij: np.ndarray        # (E, d, d) float64 relative rotations
    tij: np.ndarray        # (E, dim) float64 relative translations
    kappa: np.ndarray      # (E,) float64 rotational information weights


def build_native() -> bool:
    """Build the C++ loader (requires g++/make); returns success."""
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        build_native()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.g2o_count.argtypes = [ctypes.c_char_p] + \
        [ctypes.POINTER(ctypes.c_int32)] * 3
    lib.g2o_count.restype = ctypes.c_int
    lib.g2o_load.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.g2o_load.restype = ctypes.c_int
    lib.g2o_last_error.restype = ctypes.c_char_p
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def _load_native(path: str) -> PoseGraph:
    lib = _load_lib()
    nv = ctypes.c_int32()
    ne = ctypes.c_int32()
    dim = ctypes.c_int32()
    if lib.g2o_count(path.encode(), ctypes.byref(nv), ctypes.byref(ne),
                     ctypes.byref(dim)):
        raise ValueError(
            f"g2o parse failed: {lib.g2o_last_error().decode()}: {path}")
    E, d = ne.value, dim.value
    src = np.empty(E, np.int32)
    dst = np.empty(E, np.int32)
    Rij = np.empty(E * 9, np.float64)
    tij = np.empty(E * 3, np.float64)
    kappa = np.empty(E, np.float64)
    if lib.g2o_load(path.encode(), src, dst, Rij, tij, kappa):
        raise ValueError(
            f"g2o parse failed: {lib.g2o_last_error().decode()}: {path}")
    return PoseGraph(
        n_vertices=nv.value, dim=d, src=src, dst=dst,
        Rij=Rij.reshape(E, 3, 3)[:, :d, :d].copy(),
        tij=tij.reshape(E, 3)[:, :d].copy(), kappa=kappa)


def _rot2(theta: float) -> np.ndarray:
    c, s = math.cos(theta), math.sin(theta)
    return np.array([[c, -s], [s, c]])


def _rot3(qx, qy, qz, qw) -> np.ndarray:
    n = math.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    if n > 0:
        qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
    return np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)],
    ])


def _load_python(path: str) -> PoseGraph:
    src, dst, Rij, tij, kappa = [], [], [], [], []
    dim = 0
    max_vertex = -1
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag in ("VERTEX_SE2", "VERTEX_SE3:QUAT"):
                max_vertex = max(max_vertex, int(parts[1]))
                d = 2 if tag == "VERTEX_SE2" else 3
                if dim and dim != d:
                    raise ValueError("mixed SE2/SE3 file")
                dim = d
            elif tag == "EDGE_SE2":
                i, j = int(parts[1]), int(parts[2])
                dx, dy, dth = map(float, parts[3:6])
                info = list(map(float, parts[6:12]))
                if len(info) != 6:
                    raise ValueError("malformed EDGE_SE2 line")
                src.append(i)
                dst.append(j)
                Rij.append(_rot2(dth))
                tij.append([dx, dy])
                kappa.append(info[5])
                if dim and dim != 2:
                    raise ValueError("mixed SE2/SE3 file")
                dim = 2
                max_vertex = max(max_vertex, i, j)
            elif tag == "EDGE_SE3:QUAT":
                i, j = int(parts[1]), int(parts[2])
                vals = list(map(float, parts[3:10]))
                info = list(map(float, parts[10:31]))
                if len(info) != 21:
                    raise ValueError("malformed EDGE_SE3:QUAT line")
                src.append(i)
                dst.append(j)
                Rij.append(_rot3(*vals[3:7]))
                tij.append(vals[0:3])
                kappa.append((info[15] + info[18] + info[20]) / 3.0)
                if dim and dim != 3:
                    raise ValueError("mixed SE2/SE3 file")
                dim = 3
                max_vertex = max(max_vertex, i, j)
    if not src:
        raise ValueError(f"g2o parse failed: no pose-graph edges found: {path}")
    return PoseGraph(
        n_vertices=max_vertex + 1, dim=dim,
        src=np.asarray(src, np.int32), dst=np.asarray(dst, np.int32),
        Rij=np.asarray(Rij), tij=np.asarray(tij),
        kappa=np.asarray(kappa))


def load_g2o(path: str, native: Optional[bool] = None) -> PoseGraph:
    """Load a g2o pose graph.

    ``native=None`` (default) uses the C++ loader when the shared library is
    available (building it on first use if a toolchain exists) and falls back
    to the Python parser otherwise; ``True``/``False`` force a path.
    """
    if native is None:
        native = native_available()
    if native:
        return _load_native(path)
    return _load_python(path)
