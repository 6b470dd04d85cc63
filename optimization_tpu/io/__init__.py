"""Data loading (native C++ fast path + pure-Python fallback)."""

from .g2o import load_g2o, native_available

__all__ = ["load_g2o", "native_available"]
