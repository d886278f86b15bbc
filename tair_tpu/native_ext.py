"""Native (C++) runtime extensions, loaded via ctypes.

Build: `make -C native` or automatic on first import (g++ -O3 -shared).
Ships `lapjv_batch`, the batched Hungarian solver used by the TESTR
matchers — the native counterpart of the reference's scipy CPU hop
(matcher.py:74-76) — and `coco_ap`, the fast COCO AP accumulator (the
counterpart of detectron2's csrc/cocoeval). Falls back to the pure-Python
paths transparently if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtair_native.so")
_SOURCES = ("lapjv.cpp", "cocoeval.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _srcs() -> List[str]:
    return [os.path.join(_NATIVE_DIR, s) for s in _SOURCES]


def _stale() -> bool:
    if not os.path.exists(_SO_PATH):
        return True
    so_mtime = os.path.getmtime(_SO_PATH)
    return any(
        os.path.exists(s) and os.path.getmtime(s) > so_mtime for s in _srcs()
    )


def _build() -> bool:
    srcs = [s for s in _srcs() if os.path.exists(s)]
    if not srcs:
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", *srcs,
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
    if _stale() and not _build() and not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.lapjv_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.lapjv_batch.restype = None
        if hasattr(lib, "coco_ap"):
            lib.coco_ap.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.coco_ap.restype = None
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

def coco_ap(
    ious: Sequence[np.ndarray],       # per image [n_pred_i, n_gt_i]
    scores: Sequence[np.ndarray],     # per image [n_pred_i]
    thresholds: Sequence[float],
) -> Optional[np.ndarray]:
    """Fast COCO AP accumulation (native cocoeval counterpart).

    Returns [n_thr] float64 APs, or None when the native lib is missing."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "coco_ap"):
        return None
    n_pred = np.asarray([m.shape[0] for m in ious], np.int32)
    n_gt = np.asarray([m.shape[1] for m in ious], np.int32)
    iou_flat = (
        np.concatenate([np.ascontiguousarray(m, np.float32).reshape(-1)
                        for m in ious])
        if len(ious) else np.zeros(0, np.float32)
    )
    sc_flat = (
        np.concatenate([np.ascontiguousarray(s, np.float32).reshape(-1)
                        for s in scores])
        if len(scores) else np.zeros(0, np.float32)
    )
    thr = np.ascontiguousarray(thresholds, np.float32)
    out = np.empty(len(thr), np.float64)
    lib.coco_ap(
        iou_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sc_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(ious),
        thr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(thr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
