"""Tracing front-end: one call, several engines.

Provides the equivalent of rmagine's OnDn simulators
(`OnDnSimulatorEmbree/Optix::simulate` returning
Bundle<Hits, Ranges, Normals, ObjectIds>, RadarCPU.cpp:222-236): given
arbitrary per-ray origins + directions, return for each ray whether it hit,
the hit distance, the surface normal and the object id of the nearest
triangle.

Engines:
  * "brute"  — vmapped Moller-Trumbore over all triangles (trace/intersect.py).
               Correctness oracle; fine for small scenes.
  * "mxu"    — plane-equation intersection as two dense matmuls
               (trace/planes.py). The default: puts ray casting on the MXU.
  * "culled" — chunk-AABB culled variant of "mxu" (trace/planes.py): only the
               top-K Morton chunks whose AABB a ray block can hit are tested.
  * "pallas" — Pallas kernel with per-block chunk skipping
               (trace/pallas_trace.py); the default production engine.
  * "pallas2" — experimental Pallas variant with the chunk sweep inside the
               kernel and scene planes VMEM-resident (trace/pallas_trace.py).
  * "pallas3" — the production engine: front-to-back chunk sweep with early
               termination and double-buffered HBM->VMEM plane DMA; fastest
               at every measured scale (trace/pallas_trace.py).

All engines consume the same SceneArrays and return identical TraceResult
structures; parity is asserted in tests/test_trace.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TraceResult(NamedTuple):
    hit: jnp.ndarray      # (...,) bool
    t: jnp.ndarray        # (...,) float32 hit distance (inf on miss)
    normal: jnp.ndarray   # (..., 3) float32 unit normal, oriented against ray
    obj_id: jnp.ndarray   # (...,) int32 object id (INVALID sentinel on miss)


def trace(scene_arrays, origs, dirs, engine: str = "mxu", **kwargs) -> TraceResult:
    """Trace rays against the scene; origs/dirs shaped (..., 3)."""
    batch_shape = origs.shape[:-1]
    o = origs.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    if engine == "brute":
        from radarays_ros_tpu.trace.intersect import trace_brute
        res = trace_brute(scene_arrays, o, d, **kwargs)
    elif engine == "mxu":
        from radarays_ros_tpu.trace.planes import trace_planes
        res = trace_planes(scene_arrays, o, d, **kwargs)
    elif engine == "culled":
        from radarays_ros_tpu.trace.planes import trace_planes_culled
        res = trace_planes_culled(scene_arrays, o, d, **kwargs)
    elif engine == "pallas":
        from radarays_ros_tpu.trace.pallas_trace import trace_pallas
        res = trace_pallas(scene_arrays, o, d, **kwargs)
    elif engine == "pallas2":
        from radarays_ros_tpu.trace.pallas_trace import trace_pallas_v2
        res = trace_pallas_v2(scene_arrays, o, d, **kwargs)
    elif engine == "pallas3":
        from radarays_ros_tpu.trace.pallas_trace import trace_pallas_v3
        res = trace_pallas_v3(scene_arrays, o, d, **kwargs)
    else:
        raise ValueError(f"unknown trace engine {engine!r}")
    return TraceResult(
        hit=res.hit.reshape(batch_shape),
        t=res.t.reshape(batch_shape),
        normal=res.normal.reshape(batch_shape + (3,)),
        obj_id=res.obj_id.reshape(batch_shape),
    )
