"""ctypes bridge to the native C++ scene builder (libradarays_native.so).

The reference delegates its host-side heavy lifting (BVH build, mesh parsing)
to native code (rmagine/Embree, CMakeLists.txt:29-36). Our TPU runtime keeps
the compute path in XLA but implements the host-side builders — median-split
leaf ordering, chunk AABBs, binary PLY parsing — in C++ (native/src/builder.cpp)
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
        fp = ctypes.POINTER(ctypes.c_float)
        lib.rr_median_split_order.argtypes = [
            fp, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.rr_median_split_order.restype = None
        try:  # absent from pre-SAH .so builds (round 5): callers gate on
            lib.rr_sah_split_order.argtypes = [  # has_sah_split()
                fp, fp, fp, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.rr_sah_split_order.restype = None
        except AttributeError:
            pass
        lib.rr_chunk_aabbs.argtypes = [
            fp, ctypes.c_int64, ctypes.c_int64, fp, fp]
        lib.rr_chunk_aabbs.restype = None
        lib.rr_triangle_planes.argtypes = [fp, ctypes.c_int64, fp, fp, fp]
        lib.rr_triangle_planes.restype = None
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.rr_sweep_table_fused.argtypes = [
            fp, ctypes.c_int64, ctypes.c_int64, u16p]
        lib.rr_sweep_table_fused.restype = None
        lib.rr_tri_table.argtypes = [
            fp, fp, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, u16p]
        lib.rr_tri_table.restype = None
        i64p = ctypes.POINTER(ctypes.c_int64)
        try:  # absent from pre-round-5 .so builds: fall back to the
            lib.rr_builder_version.argtypes = []  # Python-side constant
            lib.rr_builder_version.restype = ctypes.c_int64
        except AttributeError:
            pass
        lib.rr_obj_count.argtypes = [ctypes.c_char_p, i64p, i64p, i64p]
        lib.rr_obj_count.restype = ctypes.c_int
        lib.rr_obj_parse.argtypes = [
            ctypes.c_char_p, fp, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
        lib.rr_obj_parse.restype = ctypes.c_int
        _LIB = lib
    except (OSError, AttributeError):
        _LIB = None
    return _LIB


_WARNED = False

# Fallback table-content version when the loaded .so predates the
# rr_builder_version export (or the NumPy path is in use — it mirrors the
# native semantics, but carries its own cache-key flavor). Keep in sync
# with builder.cpp:rr_builder_version.
BUILDER_VERSION = 1


def builder_version() -> int:
    """Table-content version of the active native builder.

    Folded into the scene-cache key so a builder.cpp change that alters
    produced table bytes (e.g. median-split tie-breaking) invalidates
    cached entries without needing a geom/cache.py LAYOUT_VERSION bump.
    """
    lib = _lib()
    if lib is not None and hasattr(lib, "rr_builder_version"):
        return int(lib.rr_builder_version())
    return BUILDER_VERSION


def reset_probe() -> None:
    """Forget the cached load attempt so the next available()/_lib() call
    re-probes the shared library (used after building the .so mid-process,
    e.g. bench.py's ensure_native)."""
    global _LIB, _TRIED
    _LIB = None
    _TRIED = False


def available() -> bool:
    if os.environ.get("RADARAYS_NO_NATIVE", "0") == "1":
        return False  # deliberate opt-out (tests): stay quiet
    if _lib() is not None:
        return True
    global _WARNED
    if not _WARNED:
        _WARNED = True
        import warnings

        warnings.warn(
            "radarays_ros_tpu native helper not built — host-side scene "
            "builds fall back to NumPy (several times slower at "
            "million-triangle scale). Build it once with:\n"
            "    make -C radarays_ros_tpu/native",
            stacklevel=2)
    return False


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def median_split_order(centers: np.ndarray, chunk_size: int) -> np.ndarray:
    """Median-split leaf ordering of (N, 3) points via the C++ builder
    (same contract as geom/scene.py:_median_split_order; N % chunk_size
    must be 0)."""
    lib = _lib()
    centers = np.ascontiguousarray(centers, np.float32)
    n = centers.shape[0]
    out = np.empty(n, np.int64)
    lib.rr_median_split_order(
        _fp(centers), ctypes.c_int64(n), ctypes.c_int64(chunk_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def has_sah_split() -> bool:
    """True when the loaded .so exports rr_sah_split_order (round-5+)."""
    lib = _lib()
    return lib is not None and hasattr(lib, "rr_sah_split_order")


def sah_split_order(centers: np.ndarray, tri_lo: np.ndarray,
                    tri_hi: np.ndarray, chunk_size: int) -> np.ndarray:
    """SAH-scored split ordering of (N, 3) centroids with per-triangle
    AABBs (N, 3)x2 via the C++ builder — bit-identical to
    geom/scene.py:_median_split_order_sah (pinned by
    tests/test_native.py)."""
    lib = _lib()
    centers = np.ascontiguousarray(centers, np.float32)
    tri_lo = np.ascontiguousarray(tri_lo, np.float32)
    tri_hi = np.ascontiguousarray(tri_hi, np.float32)
    n = centers.shape[0]
    out = np.empty(n, np.int64)
    lib.rr_sah_split_order(
        _fp(centers), _fp(tri_lo), _fp(tri_hi), ctypes.c_int64(n),
        ctypes.c_int64(chunk_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def _u16(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


def sweep_table_fused(planes_o: np.ndarray, chunk_size: int) -> np.ndarray:
    """(SWEEP_K, 5T) bf16 split-exact fused Pallas sweep-kernel table via
    the C++ builder (same contract as geom/scene.py:_sweep_table_fused)."""
    import ml_dtypes

    from radarays_ros_tpu.geom.scene import SWEEP_K

    lib = _lib()
    planes_o = np.ascontiguousarray(planes_o, np.float32)
    T = planes_o.shape[0] // 4
    out = np.empty((SWEEP_K, 5 * T), np.uint16)
    lib.rr_sweep_table_fused(_fp(planes_o), ctypes.c_int64(T),
                             ctypes.c_int64(chunk_size), _u16(out))
    return out.view(ml_dtypes.bfloat16)


def tri_table(verts: np.ndarray, normals: np.ndarray,
              obj_ids: np.ndarray) -> np.ndarray:
    """(48, T) bf16 split-exact winner-fetch table via the C++ builder
    (same contract as geom/scene.py:_tri_fetch_table)."""
    import ml_dtypes

    lib = _lib()
    verts = np.ascontiguousarray(verts, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    obj_ids = np.ascontiguousarray(obj_ids, np.int32)
    T = verts.shape[0]
    out = np.empty((48, T), np.uint16)
    lib.rr_tri_table(_fp(verts), _fp(normals),
                     obj_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                     ctypes.c_int64(T), _u16(out))
    return out.view(ml_dtypes.bfloat16)


def chunk_aabbs(verts: np.ndarray, chunk_size: int):
    """(C*chunk, 3, 3) verts -> ((C, 3) lo, (C, 3) hi) via the C++ builder."""
    lib = _lib()
    verts = np.ascontiguousarray(verts, np.float32)
    c = verts.shape[0] // chunk_size
    lo = np.empty((c, 3), np.float32)
    hi = np.empty((c, 3), np.float32)
    lib.rr_chunk_aabbs(_fp(verts), ctypes.c_int64(c),
                       ctypes.c_int64(chunk_size), _fp(lo), _fp(hi))
    return lo, hi


def triangle_planes(verts: np.ndarray):
    """(N, 3, 3) verts -> (normals (N,3), planes_o (4N,4), planes_d (4N,3))
    via the C++ builder (same layout as geom/scene.py:_triangle_planes)."""
    lib = _lib()
    verts = np.ascontiguousarray(verts, np.float32)
    n = verts.shape[0]
    normals = np.empty((n, 3), np.float32)
    planes_o = np.empty((4 * n, 4), np.float32)
    planes_d = np.empty((4 * n, 3), np.float32)
    lib.rr_triangle_planes(_fp(verts), ctypes.c_int64(n), _fp(normals),
                           _fp(planes_o), _fp(planes_d))
    return normals, planes_o, planes_d


def parse_obj(path):
    """Native Wavefront OBJ parse -> (verts (T,3,3) f32, obj_ids (T,) i32,
    names list[str]); raises on IO/parse errors."""
    lib = _lib()
    pathb = str(path).encode()
    n_tris = ctypes.c_int64()
    n_objects = ctypes.c_int64()
    names_len = ctypes.c_int64()
    if lib.rr_obj_count(pathb, ctypes.byref(n_tris), ctypes.byref(n_objects),
                        ctypes.byref(names_len)) != 0:
        raise IOError(f"cannot parse OBJ: {path}")
    T = n_tris.value
    verts = np.empty((T, 3, 3), np.float32)
    obj_ids = np.empty(T, np.int32)
    names_buf = ctypes.create_string_buffer(max(names_len.value, 1))
    # capacities clamp the second parse: if the file changed between count
    # and parse, the native side errors instead of overrunning the buffers
    rc = lib.rr_obj_parse(pathb, _fp(verts),
                          obj_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                          names_buf, ctypes.c_int64(T),
                          ctypes.c_int64(max(names_len.value, 1)))
    if rc != 0:
        raise IOError(f"cannot parse OBJ ({'changed on disk' if rc == 3 else 'parse error'}): {path}")
    names = names_buf.raw[:names_len.value].decode().split("\n")[:n_objects.value]
    return verts, obj_ids, names
