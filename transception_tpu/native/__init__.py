"""Native (C) runtime components, loaded via ctypes.

Auto-builds resample.c with the system compiler on first use and caches
the shared object next to the source. Every entry point has a pure
scipy/numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "resample.c")
_SO = os.path.join(_HERE, "_resample.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-march=native", "-fPIC", "-shared", "-pthread",
                 _SRC, "-o", _SO, "-lm"],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return _SO
        except (OSError, subprocess.TimeoutExpired):
            continue
    return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _SO if os.path.exists(_SO) else _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.zoom2d_batch_f32.restype = ctypes.c_int
        lib.zoom2d_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def zoom2d_batch(vol: np.ndarray, out_h: int, out_w: int, order: int,
                 threads: int = 0) -> Optional[np.ndarray]:
    """(D, H, W) float32 -> (D, out_h, out_w) float32 with scipy zoom
    semantics (order 0 or 3). Returns None if the native lib is missing."""
    lib = get_lib()
    if lib is None or order not in (0, 3):
        return None
    vol = np.ascontiguousarray(vol, np.float32)
    d, h, w = vol.shape
    out = np.empty((d, out_h, out_w), np.float32)
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 16)
    rc = lib.zoom2d_batch_f32(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), d, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
        order, threads)
    if rc != 0:
        return None
    return out
