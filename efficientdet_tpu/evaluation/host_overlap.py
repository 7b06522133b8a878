"""ctypes loader for the C++ host IoU op, with numpy fallback.

The reference shipped ``utils/compute_overlap.pyx`` (Cython); pybind11 and
Cython are unavailable offline, so the native kernel is a plain ``extern
"C"`` shared library (``cc/compute_overlap.cc``) loaded via ctypes. If the
library hasn't been built (``make -C efficientdet_tpu/cc``) — or the build
toolchain is missing — a vectorised numpy implementation with identical
semantics is used. Auto-builds on first import when g++ is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CC_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "cc")
_LIB_PATH = os.path.join(_CC_DIR, "libcompute_overlap.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False  # remember a failed build/load: compute_overlap runs
# once per (image, class) in the VOC evaluator, and re-spawning `make` for
# every call would turn the numpy-fallback path into a subprocess storm


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _CC_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.compute_overlap_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.compute_overlap_f64.restype = None
    _lib = lib
    return lib


def compute_overlap_numpy(boxes: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """Vectorised numpy IoU with the same semantics as the C++ kernel."""
    boxes = np.asarray(boxes, np.float64)
    queries = np.asarray(queries, np.float64)
    ix = np.clip(
        np.minimum(boxes[:, None, 2], queries[None, :, 2])
        - np.maximum(boxes[:, None, 0], queries[None, :, 0]),
        0,
        None,
    )
    iy = np.clip(
        np.minimum(boxes[:, None, 3], queries[None, :, 3])
        - np.maximum(boxes[:, None, 1], queries[None, :, 1]),
        0,
        None,
    )
    inter = ix * iy
    ab = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    aq = np.clip(queries[:, 2] - queries[:, 0], 0, None) * np.clip(
        queries[:, 3] - queries[:, 1], 0, None
    )
    ua = ab[:, None] + aq[None] - inter
    return np.where(ua > 0, inter / np.maximum(ua, 1e-300), 0.0)


def compute_overlap(boxes: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """(N, 4) x (K, 4) xyxy float64 -> (N, K) IoU, C++ when available."""
    boxes = np.ascontiguousarray(boxes, np.float64)
    queries = np.ascontiguousarray(queries, np.float64)
    n, k = len(boxes), len(queries)
    if n == 0 or k == 0:
        return np.zeros((n, k), np.float64)
    lib = _load()
    if lib is None:
        return compute_overlap_numpy(boxes, queries)
    out = np.empty((n, k), np.float64)
    lib.compute_overlap_f64(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def using_native() -> bool:
    return _load() is not None
