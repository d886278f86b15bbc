"""Native (C++) runtime extensions, loaded via ctypes.

Build: `make -C native` or automatic on first import (g++ -O3 -shared).
Currently ships `lapjv_batch`, the batched Hungarian solver used by the
TESTR matchers — the native counterpart of the reference's scipy CPU hop
(matcher.py:74-76). Falls back to scipy transparently if the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtair_native.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "lapjv.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", _SO_PATH],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.lapjv_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.lapjv_batch.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def lapjv_batch(cost: np.ndarray, n_valid: np.ndarray) -> Optional[np.ndarray]:
    """cost [B,Q,M] float32, n_valid [B] -> [B,M] int32 (or None if no lib)."""
    lib = get_lib()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float32)
    n_valid = np.ascontiguousarray(n_valid, np.int32)
    b, q, m = cost.shape
    out = np.empty((b, m), np.int32)
    lib.lapjv_batch(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, q, m,
        n_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out
