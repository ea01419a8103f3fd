"""ctypes bridge to the native C++ scene builder (libradarays_native.so).

The reference delegates its host-side heavy lifting (BVH build, mesh parsing)
to native code (rmagine/Embree, CMakeLists.txt:29-36). Our TPU runtime keeps
the compute path in XLA but implements the host-side builders — Morton
ordering, chunk AABBs, binary PLY parsing — in C++ (native/src/builder.cpp)
with a NumPy fallback when the shared library has not been compiled.

Build with:  make -C radarays_ros_tpu/native
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = Path(__file__).parent / "libradarays_native.so"
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.rr_morton_order.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # centers (N,3)
            ctypes.c_int64,                  # N
            ctypes.POINTER(ctypes.c_int64),  # out order (N,)
        ]
        lib.rr_morton_order.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None and os.environ.get("RADARAYS_NO_NATIVE", "0") != "1"


def morton_order(centers: np.ndarray) -> np.ndarray:
    """Morton-code argsort of (N, 3) points via the C++ builder."""
    lib = _lib()
    centers = np.ascontiguousarray(centers, np.float32)
    n = centers.shape[0]
    out = np.empty(n, np.int64)
    lib.rr_morton_order(
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out
