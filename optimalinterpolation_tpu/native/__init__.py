"""ctypes bindings for the C++ data-plane (builds on first import).

Provides:
  * ``parse_proc(path) -> np.ndarray``           (np.genfromtxt replacement)
  * ``radius_neighbors(points, cells, r)``       (cKDTree.query_ball_point
     -> CSR (offsets, indices) replacement, uniform-grid hash)
  * ``available() -> bool``

If the shared library cannot be built (no compiler), callers fall back to the
NumPy/SciPy paths; nothing in the framework hard-requires the native layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "liboi_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.oi_parse_proc.restype = ctypes.POINTER(ctypes.c_double)
    lib.oi_parse_proc.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.oi_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.oi_radius_count.argtypes = [
        f64p, ctypes.c_int64, f64p, ctypes.c_int64, ctypes.c_double, i64p
    ]
    lib.oi_radius_fill.argtypes = [
        f64p, ctypes.c_int64, f64p, ctypes.c_int64, ctypes.c_double, i64p, i64p
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_proc(path: str) -> np.ndarray:
    """Parse a .proc numeric text table to (rows, cols) float64."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    ptr = lib.oi_parse_proc(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if not ptr:
        raise RuntimeError(f"native parse failed for {path}")
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(rows.value, cols.value)
        return arr.copy()
    finally:
        lib.oi_free(ptr)


def radius_neighbors(
    points_xy: np.ndarray, cells_xy: np.ndarray, radius: float
) -> tuple[np.ndarray, np.ndarray]:
    """CSR fixed-radius neighbors: (offsets (M+1,), indices (total,))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points_xy, dtype=np.float64)
    cells = np.ascontiguousarray(cells_xy, dtype=np.float64)
    n, m = len(pts), len(cells)
    counts = np.empty(m, dtype=np.int64)
    lib.oi_radius_count(pts, n, cells, m, float(radius), counts)
    offsets = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.int64)
    lib.oi_radius_fill(pts, n, cells, m, float(radius), offsets, out)
    return offsets, out
