"""In-tree native (C++) host-side kernels with pure-Python fallbacks.

The reference's host hot loops run in native code shipped by its
dependencies — pycocotools' C extension for COCOeval matching (reference
eval/coco.py:6-7) and SciPy's compiled Hungarian solver for tracker
association (reference models/tracker.py:8,156-178). Neither pycocotools
nor filterpy exists in this environment, so this package carries its own
native implementations (src/native_ops.cc), compiled on first import with
the system g++ into a content-addressed shared object and bound through
ctypes (no pybind11 required).

If compilation fails (no compiler, sandboxed filesystem), every consumer
falls back to the equivalent numpy/scipy path — the native path is purely a
speedup. COCO matching is bit-identical either way; assignment returns the
same optimal total cost, but when multiple optima exist (tied costs, common
with IoU-distance matrices) the C++ solver may pick a different optimal
pairing than scipy — identical except under such degenerate ties. Disable
explicitly with CENTERNET_TPU_NO_NATIVE=1.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "set_enabled", "lap_assign", "lap_assign_or_scipy",
           "coco_match"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "native_ops.cc")
_BUILD_DIR = os.path.join(_DIR, "_build")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_enabled = os.environ.get("CENTERNET_TPU_NO_NATIVE", "0") != "1"


def _compile_and_load() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha1(src).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"native_ops_{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        tmp = so_path + f".tmp.{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-march=native", _SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            # retry without -march=native (unsupported on some toolchains)
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)  # atomic: safe under concurrent pytest
    lib = ctypes.CDLL(so_path)
    lib.cl_lap_assign.restype = ctypes.c_int
    lib.cl_lap_assign.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cl_coco_match.restype = None
    lib.cl_coco_match.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _enabled:
        return None
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            try:
                _lib = _compile_and_load()
            except Exception:
                _lib = None  # fall back silently; consumers use numpy/scipy
    return _lib


def available() -> bool:
    """True when the compiled library is loaded (compiles on first call)."""
    return _get_lib() is not None


def set_enabled(flag: bool) -> None:
    """Test hook: force the pure-Python fallback paths on/off."""
    global _enabled, _tried
    _enabled = bool(flag)
    if flag:
        _tried = False  # allow a fresh compile attempt


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def lap_assign(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimum-cost assignment over a finite rectangular cost matrix.

    Same contract as scipy.optimize.linear_sum_assignment: returns
    (row_indices sorted ascending, matched column per row), pairing
    min(R, C) rows/columns at optimal total cost. Raises RuntimeError if
    the native library is unavailable or the problem is infeasible —
    callers keep scipy as the fallback.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    cost = np.ascontiguousarray(cost, np.float64)
    r, c = cost.shape
    if r == 0 or c == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    transpose = r > c
    a = np.ascontiguousarray(cost.T) if transpose else cost
    n, m = a.shape
    col4row = np.empty(n, np.int32)
    rc = lib.cl_lap_assign(_ptr(a, ctypes.c_double), n, m,
                           _ptr(col4row, ctypes.c_int))
    if rc != 0:
        raise RuntimeError("infeasible assignment (non-finite costs?)")
    rows = np.arange(n, dtype=np.int64)
    cols = col4row.astype(np.int64)
    if transpose:
        rows, cols = cols, rows
        order = np.argsort(rows, kind="stable")
        rows, cols = rows[order], cols[order]
    return rows, cols


def coco_match(ious: np.ndarray, iou_thrs: np.ndarray, gt_ig: np.ndarray,
               gt_crowd: np.ndarray) -> Optional[np.ndarray]:
    """COCOeval greedy matching over (D, G) IoUs at T thresholds.

    Returns dtm (T, D) int64 — matched GT index + 1, 0 for unmatched — or
    None when the native library is unavailable (caller runs the numpy
    loop). Bit-identical to eval/coco_eval.py's reference loop.
    """
    lib = _get_lib()
    if lib is None:
        return None
    ious = np.ascontiguousarray(ious, np.float64)
    d, g = ious.shape
    thrs = np.ascontiguousarray(iou_thrs, np.float64)
    t = len(thrs)
    dtm = np.zeros((t, d), np.int64)
    if d == 0 or g == 0:
        return dtm
    gt_ig = np.ascontiguousarray(gt_ig, np.uint8)
    gt_crowd = np.ascontiguousarray(gt_crowd, np.uint8)
    lib.cl_coco_match(_ptr(ious, ctypes.c_double), d, g,
                      _ptr(thrs, ctypes.c_double), t,
                      _ptr(gt_ig, ctypes.c_ubyte),
                      _ptr(gt_crowd, ctypes.c_ubyte),
                      _ptr(dtm, ctypes.c_longlong))
    return dtm


def lap_assign_or_scipy(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """lap_assign with a transparent scipy fallback (non-finite costs, no
    compiler). Drop-in for scipy.optimize.linear_sum_assignment on
    minimization problems."""
    cost = np.asarray(cost, np.float64)
    if np.isfinite(cost).all() and available():
        try:
            return lap_assign(cost)
        except RuntimeError:
            pass
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(cost)
