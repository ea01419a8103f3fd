"""Scene representation: flat triangle soup + object ids + material map.

Replaces the reference's rmagine Embree/OptiX map import
(src/radar_simulator.cpp:149,164) with a backend-neutral array form: the whole
scene is a (T, 3, 3) float32 vertex tensor plus an int32 object id per
triangle, and an object->material lookup table (the `object_materials` ROS
param, Radar.cpp:220-226). Host-side state is NumPy; `device_arrays()`
produces the jnp pytree consumed by the tracers, including precomputed
plane-equation coefficients for the MXU tracer (trace/planes.py) and
median-split leaf chunks + AABBs for the culled tracers.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import numpy as np


class SceneArrays(NamedTuple):
    """Device-side scene pytree (all jnp arrays once put on device)."""

    verts: np.ndarray            # (T, 3, 3) triangle vertices
    obj_ids: np.ndarray          # (T,) int32 object id per triangle
    normals: np.ndarray          # (T, 3) unit geometric normals
    planes_o: np.ndarray         # (4T, 4) plane rows for origin side: [n, offset]
    planes_d: np.ndarray         # (4T, 3) plane normals for direction side
    chunk_aabb_lo: np.ndarray    # (C, 3) chunk AABB minima
    chunk_aabb_hi: np.ndarray    # (C, 3) chunk AABB maxima
    chunk_size: int              # triangles per chunk (static)
    # Pallas-kernel DMA layout of the plane tables, (4, C*4*chunk_size) with
    # chunk-major [support|edge0|edge1|edge2] row groups (planes_d zero-padded
    # to 4 coords). Scene-constant: precomputing it here keeps a ~2x128 MB
    # strided transpose out of every traced pallas3 call (None -> the tracer
    # derives it on the fly, e.g. for hand-built SceneArrays).
    planes_o_t: Optional[np.ndarray] = None   # (4, 4T)
    planes_d_t: Optional[np.ndarray] = None   # (4, 4T)
    # Packed per-triangle fetch table for the pallas3 in-kernel hit fetch,
    # (16, T): rows 0-8 = v0,e1,e2; 9-11 = unit normal; 12 = obj_id as f32
    # (-1 for padding triangles); 13-15 zero. The sweep kernel contracts it
    # against a one-hot of each lane's winning triangle (an MXU matmul per
    # visited chunk), replacing XLA row gathers that run at ~1.5 GB/s.
    tri_table_t: Optional[np.ndarray] = None  # (16, T)

    @property
    def n_triangles(self) -> int:
        return self.verts.shape[0]

    @property
    def n_chunks(self) -> int:
        return self.chunk_aabb_lo.shape[0]


def _triangle_planes(verts: np.ndarray):
    """Plane-equation form of Moller-Trumbore for the MXU tracer.

    For each triangle (v0, v1, v2) with geometric normal n:
      * support plane:  s0(x) = n.x - n.v0         (hit when s0(o) + t n.d = 0)
      * 3 edge planes:  sk(x) = mk.x - mk.vk  with mk = n x (v_{k+1} - v_k),
        oriented so points inside the triangle have sk >= 0.

    A point p is inside iff s1(p), s2(p), s3(p) >= 0; the ray parameter is
    t = -s0(o) / (n.d). Evaluating sk(o) and n_k.d for all (ray, plane) pairs
    is two dense matmuls — that is what puts ray casting on the MXU.
    """
    v0, v1, v2 = verts[:, 0], verts[:, 1], verts[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n_unit = n / np.maximum(norm, 1e-30)

    edges = [(v0, v1), (v1, v2), (v2, v0)]
    plane_normals = [n_unit]
    plane_offsets = [-np.sum(n_unit * v0, axis=-1)]
    for a, b in edges:
        m = np.cross(n_unit, b - a)
        mlen = np.linalg.norm(m, axis=-1, keepdims=True)
        m = m / np.maximum(mlen, 1e-30)
        plane_normals.append(m)
        plane_offsets.append(-np.sum(m * a, axis=-1))

    # interleave per triangle: [support, edge0, edge1, edge2]
    N = np.stack(plane_normals, axis=1)          # (T, 4, 3)
    O = np.stack(plane_offsets, axis=1)          # (T, 4)
    planes_d = N.reshape(-1, 3).astype(np.float32)               # (4T, 3)
    planes_o = np.concatenate(
        [N.reshape(-1, 3), O.reshape(-1, 1)], axis=-1
    ).astype(np.float32)                                          # (4T, 4)
    return n_unit.astype(np.float32), planes_o, planes_d


def _kernel_plane_layout(planes_o: np.ndarray, planes_d: np.ndarray,
                         chunk_size: int):
    """Transpose the interleaved (4T, 4)/(4T, 3) plane tables into the
    pallas3 kernel's HBM DMA layout: (4, C*4*Tc) with chunk-major
    [support rows | edge0 | edge1 | edge2] groups, so one chunk's slab is a
    contiguous 128-aligned block whose trailing (lane) dimension carries the
    triangle axis (trace/pallas_trace.py)."""
    tc = chunk_size
    C = planes_o.shape[0] // (4 * tc)
    po = np.ascontiguousarray(
        planes_o.reshape(C, tc, 4, 4).transpose(0, 2, 1, 3).reshape(-1, 4).T)
    pd_rows = planes_d.reshape(C, tc, 4, 3).transpose(0, 2, 1, 3)
    pd = np.concatenate(
        [pd_rows, np.zeros((C, 4, tc, 1), np.float32)], axis=-1
    ).reshape(-1, 4).T
    return po.astype(np.float32), np.ascontiguousarray(pd, np.float32)


def _median_split_order(centers: np.ndarray, chunk_size: int) -> np.ndarray:
    """Top-down longest-axis median split into leaves of exactly chunk_size.

    The permutation groups triangles into spatially COMPACT runs — the BVH
    leaf build, with the split snapped to a chunk_size multiple so every
    chunk is one tight leaf. Compared to raw Morton-code runs (whose AABBs
    straddle curve jumps), leaf AABBs overlap far fewer ray frustums: on
    the 1M-triangle urban bench a representative ray block overlaps 11
    chunks within hit range instead of 110, which directly multiplies the
    culled/pallas3 sweep throughput. Requires len(centers) % chunk_size == 0
    (callers pad with far triangles first); every leaf is then exactly
    chunk_size, by induction (the split point is a chunk_size multiple).
    """
    n = centers.shape[0]
    assert n % chunk_size == 0
    out = np.empty(n, np.int64)
    pos = 0
    stack = [np.arange(n)]
    while stack:
        s = stack.pop()
        if s.shape[0] <= chunk_size:
            out[pos:pos + s.shape[0]] = s
            pos += s.shape[0]
            continue
        c = centers[s]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        half = ((s.shape[0] // 2) // chunk_size) * chunk_size
        part = np.argpartition(c[:, ax], half)
        stack.append(s[part[half:]])
        stack.append(s[part[:half]])
    return out


def _tri_fetch_table(verts: np.ndarray, normals: np.ndarray,
                     obj_ids: np.ndarray) -> np.ndarray:
    """(16, T) packed triangle data for the in-kernel winner fetch
    (see SceneArrays.tri_table_t). obj ids are stored as exact f32
    (< 2^24); INVALID/padding triangles store -1."""
    T = verts.shape[0]
    out = np.zeros((16, T), np.float32)
    v0 = verts[:, 0]
    out[0:3] = v0.T
    out[3:6] = (verts[:, 1] - v0).T
    out[6:9] = (verts[:, 2] - v0).T
    out[9:12] = normals.T
    obj = obj_ids.astype(np.int64)
    out[12] = np.where((obj >= 0) & (obj < 2**24), obj, -1).astype(np.float32)
    return out


@dataclasses.dataclass
class Scene:
    """Host-side scene: triangle soup + per-triangle object ids.

    `object_materials[obj_id]` gives the material id of an object, as in the
    reference's `object_materials` param (config/mulran_kaist02.yaml,
    Radar.cpp:224).
    """

    verts: np.ndarray                 # (T, 3, 3) float32
    obj_ids: np.ndarray               # (T,) int32
    object_names: Optional[Sequence[str]] = None
    chunk_size: int = 256

    def __post_init__(self):
        self.verts = np.ascontiguousarray(self.verts, dtype=np.float32)
        self.obj_ids = np.ascontiguousarray(self.obj_ids, dtype=np.int32)
        if self.verts.ndim != 3 or self.verts.shape[1:] != (3, 3):
            raise ValueError(f"verts must be (T,3,3), got {self.verts.shape}")
        if self.obj_ids.shape != (self.verts.shape[0],):
            raise ValueError("obj_ids must be (T,)")

    @property
    def n_triangles(self) -> int:
        return self.verts.shape[0]

    @property
    def n_objects(self) -> int:
        return int(self.obj_ids.max()) + 1 if self.n_triangles else 0

    def transformed(self, R: np.ndarray, t: np.ndarray) -> "Scene":
        """Rigidly transform the scene (pre_transform of mesh_publisher.cpp)."""
        v = self.verts.reshape(-1, 3) @ np.asarray(R, np.float32).T + np.asarray(
            t, np.float32
        )
        return Scene(v.reshape(-1, 3, 3), self.obj_ids.copy(), self.object_names,
                     self.chunk_size)

    def device_arrays(self) -> SceneArrays:
        """Build the flattened, spatially-chunked device representation.

        Triangles are padded with degenerate far-away triangles to a
        multiple of chunk_size, then reordered by a top-down median split
        of their centroids (_median_split_order) so each chunk is one tight
        BVH-style leaf — the AABB quality that makes the culled/pallas3
        chunk sweeps short. Plane/AABB precomputation uses the native C++
        builder (native/) when available, else NumPy.
        """
        from radarays_ros_tpu.native import builder as native_builder

        verts, obj_ids = self.verts, self.obj_ids
        if self.n_triangles == 0:
            raise ValueError("empty scene")

        # pad FIRST (far degenerate triangles cluster into their own
        # leaves), so the median split can keep every leaf exactly full.
        # The chunk count is rounded to a multiple of 8 so every
        # prep_group in {1,2,4,8} divides it — otherwise the tracer falls
        # off its precomputed-table fast path (at 10M triangles the
        # on-the-fly relayout materializes ~20 GB)
        T = verts.shape[0]
        C = -(-T // self.chunk_size)
        C = -(-C // 8) * 8
        pad = C * self.chunk_size - T
        if pad:
            far = np.full((pad, 3, 3), 1e8, np.float32)
            # tiny offsets keep normals finite
            far[:, 1, 0] += 1.0
            far[:, 2, 1] += 1.0
            verts = np.concatenate([verts, far], axis=0)
            obj_ids = np.concatenate(
                [obj_ids, np.full((pad,), INVALID_OBJ_ID, np.int32)]
            )

        centers = verts.mean(axis=1)
        order = (native_builder.median_split_order(centers, self.chunk_size)
                 if native_builder.available()
                 else _median_split_order(centers, self.chunk_size))
        verts = np.ascontiguousarray(verts[order])
        obj_ids = np.ascontiguousarray(obj_ids[order])

        if native_builder.available():
            normals, planes_o, planes_d = native_builder.triangle_planes(verts)
            lo, hi = native_builder.chunk_aabbs(verts, self.chunk_size)
        else:
            normals, planes_o, planes_d = _triangle_planes(verts)
            chunks = verts.reshape(C, self.chunk_size, 3, 3)
            lo = chunks.min(axis=(1, 2))
            hi = chunks.max(axis=(1, 2))

        po_t, pd_t = _kernel_plane_layout(planes_o, planes_d, self.chunk_size)
        tri_t = _tri_fetch_table(verts, normals, obj_ids)
        return SceneArrays(
            verts=verts,
            obj_ids=obj_ids,
            normals=normals,
            planes_o=planes_o,
            planes_d=planes_d,
            chunk_aabb_lo=lo.astype(np.float32),
            chunk_aabb_hi=hi.astype(np.float32),
            chunk_size=self.chunk_size,
            planes_o_t=po_t,
            planes_d_t=pd_t,
            tri_table_t=tri_t,
        )

    @staticmethod
    def compose(parts: Sequence[np.ndarray], names: Optional[Sequence[str]] = None,
                chunk_size: int = 256) -> "Scene":
        """Build a scene from a list of per-object (Ti, 3, 3) vertex arrays."""
        verts = np.concatenate(parts, axis=0).astype(np.float32)
        obj_ids = np.concatenate(
            [np.full((p.shape[0],), i, np.int32) for i, p in enumerate(parts)]
        )
        return Scene(verts, obj_ids, names, chunk_size)


# Sentinel for "no hit" object ids; the reference flags invalid hits with
# obj_id > 10000 (radar_algorithms.cpp:29, RadarCPU.cpp:252).
INVALID_OBJ_ID = np.int32(2**31 - 1)
