"""Native (C++) host kernels with build-on-first-use + numpy fallbacks.

See ``soap_native.cpp`` for what lives here and why.  The library is
compiled with g++ into the package directory on first import; every
entry point has a pure-numpy fallback so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "soap_native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_soap_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(
                _LIB
            ) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-std=c++17",
                        "-shared",
                        "-fPIC",
                        "-pthread",
                        _SRC,
                        "-o",
                        _LIB,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            i64 = ctypes.c_int64
            p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            p_u64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
            p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            lib.hilbert_keys_3d.argtypes = [p_i64, i64, ctypes.c_int, p_u64]
            lib.match_sorted.argtypes = [p_u64, i64, p_u64, i64, p_i64]
            lib.match_ids.argtypes = [p_u64, i64, p_u64, i64, p_i64]
            lib.split_hi_lo.argtypes = [p_f64, i64, p_f32, p_f32]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def hilbert_keys_3d(ijk: np.ndarray, bits: int) -> Optional[np.ndarray]:
    """Hilbert keys of (N, 3) integer cells, or None when native is
    unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    ijk = np.ascontiguousarray(ijk, dtype=np.int64)
    out = np.empty(len(ijk), dtype=np.uint64)
    lib.hilbert_keys_3d(ijk, len(ijk), bits, out)
    return out


def match_ids(needles: np.ndarray, haystack: np.ndarray) -> Optional[np.ndarray]:
    """Row of each needle in the (unsorted) haystack, -1 when absent."""
    lib = _load()
    if lib is None:
        return None
    needles = np.ascontiguousarray(needles, dtype=np.uint64)
    haystack = np.ascontiguousarray(haystack, dtype=np.uint64)
    out = np.empty(len(needles), dtype=np.int64)
    lib.match_ids(needles, len(needles), haystack, len(haystack), out)
    return out


def split_hi_lo(x: np.ndarray):
    """(hi, lo) float32 split of a float64 array, or None."""
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(x, dtype=np.float64).ravel()
    hi = np.empty(flat.shape, np.float32)
    lo = np.empty(flat.shape, np.float32)
    lib.split_hi_lo(flat, flat.size, hi, lo)
    return hi.reshape(x.shape), lo.reshape(x.shape)
