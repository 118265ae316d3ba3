"""Native (C++) host-side runtime components, loaded via ctypes.

The reference's native surface lives in external deps (SURVEY.md §2.4);
here the host-side hot paths that are not TPU work — assignment solving for
tracking association — are first-party C++ (native/assignment.cpp), built by
``python -m posepipeline_tpu.native.build`` (or lazily on first use) into
``_libppt.so``. Pure-Python fallbacks (scipy) keep everything working when a
compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "assignment.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libppt.so")
_lock = threading.Lock()
_lib = None


def build(force: bool = False) -> str:
    """Compile the native library (g++ -O3 -shared)."""
    if force or not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               _SRC, "-o", _LIB_PATH]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is None:
            build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.solve_assignment.restype = ctypes.c_int
            lib.solve_assignment.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32)]
            lib.iou_matrix.restype = None
            lib.iou_matrix.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_double)]
            _lib = lib
    return _lib


def solve_assignment(cost: np.ndarray):
    """Hungarian/JV assignment: (n, m) cost → (rows, cols) like scipy.

    Transposes internally when n > m (solver requires n <= m).
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    lib = _load()
    transposed = n > m
    if transposed:
        cost = np.ascontiguousarray(cost.T)
        n, m = m, n
    out = np.zeros(n, dtype=np.int32)
    rc = lib.solve_assignment(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError(f"solve_assignment failed (rc={rc})")
    rows = np.arange(n)
    if transposed:
        return out, rows
    return rows, out


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    out = np.zeros((n, m), dtype=np.float64)
    if n and m:
        _load().iou_matrix(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
