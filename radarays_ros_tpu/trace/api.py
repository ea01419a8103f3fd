"""Tracing front-end: one call, several engines.

Provides the equivalent of rmagine's OnDn simulators
(`OnDnSimulatorEmbree/Optix::simulate` returning
Bundle<Hits, Ranges, Normals, ObjectIds>, RadarCPU.cpp:222-236): given
arbitrary per-ray origins + directions, return for each ray whether it hit,
the hit distance, the surface normal and the object id of the nearest
triangle.

Engines (each survivor has a distinct job):
  * "brute"  — vmapped Moller-Trumbore over all triangles (trace/intersect.py).
               The correctness ORACLE every other engine is parity-tested
               against; shares no code with the plane-form engines.
  * "mxu"    — plane-equation intersection as two dense matmuls over ALL
               triangle chunks (trace/planes.py). The simple exact MXU
               formulation; baseline for the culled variants and the fastest
               choice for tiny scenes (no culling overhead).
  * "culled" — ordered chunk sweep with early termination, pure XLA
               (trace/planes.py). The portable correctness model of the
               pallas3 traversal (same criterion, lax.while_loop of XLA
               dispatches) and the fast engine on non-TPU backends.
  * "pallas3" — the production TPU engine: front-to-back chunk sweep with
               per-lane early termination and double-buffered HBM->VMEM
               plane DMA (trace/pallas_trace.py); fastest at every measured
               scale on TPU.
  * "auto"   — resolve per backend: "pallas3" on TPU, "culled" elsewhere
               (Pallas interpret mode is far slower than XLA on CPU).

Round-1 engines "pallas" (v1) and "pallas2" were retired in round 2:
superseded by pallas3 at every measured scale (docs/PERFORMANCE.md).

All engines consume the same SceneArrays and return identical TraceResult
structures; parity is asserted in tests/test_trace.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ENGINES = ("auto", "brute", "mxu", "culled", "pallas3")


class TraceResult(NamedTuple):
    hit: jnp.ndarray      # (...,) bool
    t: jnp.ndarray        # (...,) float32 hit distance (inf on miss)
    normal: jnp.ndarray   # (..., 3) float32 unit normal, oriented against ray
    obj_id: jnp.ndarray   # (...,) int32 object id (INVALID sentinel on miss)
    # optional per-hit value fetched from a caller-provided per-triangle
    # table (trace(tri_aux=...)); 0.0 on miss. Only the pallas3 engine
    # fetches it in-kernel — callers on other engines gather themselves.
    aux: jnp.ndarray = None


def combine_trace_shards(res: TraceResult, axis: str) -> TraceResult:
    """Merge per-device trace results of a chunk-sharded scene.

    Inside shard_map with the scene partitioned over mesh axis `axis`
    (geom/scene.py:shard_scene_arrays), every device traces ALL rays
    against ITS chunk wedge; the global nearest hit per ray is the
    min-over-devices of the local winners. One pmin picks the winning
    distance, a second pmin breaks exact-distance ties deterministically
    by shard index (coplanar surfaces straddling a shard boundary), and
    one psum broadcasts the winner's (normal, obj_id, aux) rows — the
    cross-chip traffic is ~6 f32 per ray per bounce, all on ICI.
    """
    t = jnp.where(res.hit, res.t, jnp.inf)
    t_g = jax.lax.pmin(t, axis)
    idx = jax.lax.axis_index(axis)
    win = res.hit & (t == t_g)
    widx = jax.lax.pmin(jnp.where(win, idx, jnp.int32(2**30)), axis)
    mine = win & (idx == widx)
    hit_g = jnp.isfinite(t_g)
    normal = jax.lax.psum(jnp.where(mine[..., None], res.normal, 0.0), axis)
    obj = jax.lax.psum(jnp.where(mine, res.obj_id, 0), axis)
    aux = (None if res.aux is None
           else jax.lax.psum(jnp.where(mine, res.aux, 0.0), axis))
    from radarays_ros_tpu.geom.scene import INVALID_OBJ_ID

    return TraceResult(
        hit=hit_g,
        t=jnp.where(hit_g, t_g, jnp.inf),
        normal=normal,
        obj_id=jnp.where(hit_g, obj, INVALID_OBJ_ID),
        aux=aux,
    )


def resolve_engine(engine: str) -> str:
    """Resolve "auto" to the fast engine for the current backend."""
    if engine == "auto":
        return "pallas3" if jax.default_backend() == "tpu" else "culled"
    return engine


def trace(scene_arrays, origs, dirs, engine: str = "auto", t_budget=None,
          tri_aux=None, **kwargs) -> TraceResult:
    """Trace rays against the scene; origs/dirs shaped (..., 3).

    tri_aux: optional (T,) float32 per-triangle values; the pallas3 engine
    fetches the winning triangle's value in-kernel and returns it as
    TraceResult.aux (0.0 on miss) — XLA row gathers by hit index run at
    ~1.5 GB/s on TPU, so hot per-hit lookups (e.g. the object->material
    map) should ride the kernel's fetch pass instead. Other engines ignore
    it (aux is None); callers gather themselves there.

    t_budget: optional per-ray maximum hit distance, shaped like
    origs[..., 0]. A hit beyond a ray's budget is reported as a MISS (for
    every engine identically). The culled/pallas3 engines additionally use
    the budget to PRUNE their chunk sweeps — chunks a ray can only enter
    beyond its budget never count toward its sweep — which is exact: any
    triangle within budget lies in a chunk whose entry distance is within
    budget. The simulation pipeline derives budgets from the remaining
    polar-image range (sim/pipeline.py:_bounce), the dominant large-scene
    optimization.
    """
    batch_shape = origs.shape[:-1]
    o = origs.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    b = None if t_budget is None else \
        jnp.asarray(t_budget, jnp.float32).reshape(-1)
    engine = resolve_engine(engine)
    if engine == "brute":
        from radarays_ros_tpu.trace.intersect import trace_brute
        res = trace_brute(scene_arrays, o, d, **kwargs)
    elif engine == "mxu":
        from radarays_ros_tpu.trace.planes import trace_planes
        res = trace_planes(scene_arrays, o, d, **kwargs)
    elif engine == "culled":
        from radarays_ros_tpu.trace.planes import trace_planes_culled
        res = trace_planes_culled(scene_arrays, o, d, t_budget=b, **kwargs)
    elif engine == "pallas3":
        from radarays_ros_tpu.trace.pallas_trace import trace_pallas_v3
        res = trace_pallas_v3(scene_arrays, o, d, t_budget=b,
                              tri_aux=tri_aux, **kwargs)
    else:
        raise ValueError(f"unknown trace engine {engine!r}")
    if b is not None:
        # uniform budget contract across engines: nearest-hit-beyond-budget
        # is a miss. (If the nearest hit is beyond budget, no hit is within
        # it — every farther one is too — so masking the nearest is exact.)
        from radarays_ros_tpu.geom.scene import INVALID_OBJ_ID

        ok = res.hit & (res.t <= b)
        res = TraceResult(
            hit=ok,
            t=jnp.where(ok, res.t, jnp.inf),
            normal=jnp.where(ok[:, None], res.normal, 0.0),
            obj_id=jnp.where(ok, res.obj_id, INVALID_OBJ_ID),
            aux=None if res.aux is None else jnp.where(ok, res.aux, 0.0),
        )
    return TraceResult(
        hit=res.hit.reshape(batch_shape),
        t=res.t.reshape(batch_shape),
        normal=res.normal.reshape(batch_shape + (3,)),
        obj_id=res.obj_id.reshape(batch_shape),
        aux=None if res.aux is None else res.aux.reshape(batch_shape),
    )
