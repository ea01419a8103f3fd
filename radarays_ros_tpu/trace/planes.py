"""MXU tracer: ray-triangle intersection as dense matmuls.

The TPU's FLOPs live in the 128x128 systolic array, so instead of translating
Embree's BVH traversal (the reference's L0, CMakeLists.txt:29-36) we recast
intersection in plane-equation form (see geom/scene.py:_triangle_planes):

    SO = [o | 1] @ planes_o^T        (R, 4) x (4, 4T)  -> (R, 4T)
    SD =  d      @ planes_d^T        (R, 3) x (3, 4T)  -> (R, 4T)

For triangle j: t = -SO[:, 4j] / SD[:, 4j], and the hit point is inside iff
SO[:, 4j+k] + t * SD[:, 4j+k] >= -eps for the three edge planes k=1..3.
Both matmuls ride the MXU; only the cheap select/compare tail runs on the VPU.

Two variants:
  * trace_planes        — all triangles, scanned in T-chunks (exact).
  * trace_planes_culled — per ray-block chunk-AABB culling: only the K
    nearest-entry leaf chunks that the block's rays can touch are tested.
    Exact when K >= n_chunks; otherwise a hit can only be missed if more than
    K chunks lie closer than the true hit — with median-split leaf chunks and
    K sized via `suggest_k` this does not happen in practice (validated
    against "brute" in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from radarays_ros_tpu.geom.scene import INVALID_OBJ_ID
from radarays_ros_tpu.trace.api import TraceResult

_DIR_EPS = 1e-12
_INSIDE_EPS = 1e-5  # meters; edge planes are unit-normalized


def _refine_t(scene, origs, dirs, best_idx, best_t):
    """Recompute t with Moller-Trumbore against only the winning triangle.

    The plane-form t is ill-conditioned at grazing incidence (small n.d); one
    per-ray single-triangle MT evaluation restores parity with the brute
    oracle at negligible cost (R rays x 1 triangle).
    """
    verts = jnp.asarray(scene.verts)[best_idx]          # (R, 3, 3)
    v0 = verts[:, 0]
    e1 = verts[:, 1] - v0
    e2 = verts[:, 2] - v0
    pvec = jnp.cross(dirs, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    tvec = origs - v0
    qvec = jnp.cross(tvec, e1)
    t_mt = jnp.sum(e2 * qvec, axis=-1) / jnp.where(jnp.abs(det) > _DIR_EPS, det, 1.0)
    ok = (jnp.abs(det) > _DIR_EPS) & jnp.isfinite(best_t)
    return jnp.where(ok, t_mt, best_t)


def _finalize(scene, origs, dirs, best_idx, best_t):
    best_t = _refine_t(scene, origs, dirs, best_idx, best_t)
    normals = jnp.asarray(scene.normals)
    obj_ids = jnp.asarray(scene.obj_ids)
    hit = jnp.isfinite(best_t)
    n = normals[best_idx]
    n = jnp.where(jnp.sum(n * dirs, axis=-1, keepdims=True) > 0.0, -n, n)
    return TraceResult(
        hit=hit,
        t=jnp.where(hit, best_t, jnp.inf),
        normal=jnp.where(hit[:, None], n, 0.0),
        obj_id=jnp.where(hit, obj_ids[best_idx], INVALID_OBJ_ID),
    )


def _finalize_packed(origs, dirs, best_t, tri, with_aux: bool = False):
    """_finalize for engines that fetch the winner's data in-kernel.

    tri: (R, 16) packed rows [v0, e1, e2, normal, obj_id_f32, pad]
    (geom/scene.py:_tri_fetch_table), contracted out of the scene table by
    the pallas3 sweep kernel — XLA row-gathers of verts/normals/obj ids run
    at ~1.5 GB/s on TPU and dominated the post-trace cost. The Moller-
    Trumbore refinement (and its gradients w.r.t. origs/dirs) is unchanged.
    """
    v0 = tri[:, 0:3]
    e1 = tri[:, 3:6]
    e2 = tri[:, 6:9]
    pvec = jnp.cross(dirs, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    tvec = origs - v0
    qvec = jnp.cross(tvec, e1)
    t_mt = jnp.sum(e2 * qvec, axis=-1) / jnp.where(
        jnp.abs(det) > _DIR_EPS, det, 1.0)
    ok = (jnp.abs(det) > _DIR_EPS) & jnp.isfinite(best_t)
    t = jnp.where(ok, t_mt, best_t)

    hit = jnp.isfinite(best_t)
    n = tri[:, 9:12]
    n = jnp.where(jnp.sum(n * dirs, axis=-1, keepdims=True) > 0.0, -n, n)
    obj_f = tri[:, 12]
    obj = jnp.where(hit & (obj_f >= 0.0), obj_f.astype(jnp.int32),
                    INVALID_OBJ_ID)
    return TraceResult(
        hit=hit,
        t=jnp.where(hit, t, jnp.inf),
        normal=jnp.where(hit[:, None], n, 0.0),
        obj_id=obj,
        aux=jnp.where(hit, tri[:, 13], 0.0) if with_aux else None,
    )


def _plane_hits(o_aug, d, po_T, pd_T, t_min, t_max):
    """Intersect a ray block against a chunk of triangles via two matmuls.

    o_aug: (R, 4); d: (R, 3); po_T: (4, 4*Tc); pd_T: (3, 4*Tc).
    Returns (t, hit) of shape (R, Tc).

    precision=HIGHEST is load-bearing: XLA's DEFAULT matmul precision on
    TPU truncates f32 inputs to bf16, which quantizes t by ~0.4% relative
    — more than enough to reorder nearby surfaces and break the
    engines-match-brute exactness contract on real hardware (brute's
    elementwise Moller-Trumbore and the Mosaic kernel's matmuls are both
    f32-exact). CPU/GPU backends are unaffected (f32 either way).
    """
    hi = jax.lax.Precision.HIGHEST
    so = jnp.dot(o_aug, po_T, preferred_element_type=jnp.float32,
                 precision=hi)
    sd = jnp.dot(d, pd_T, preferred_element_type=jnp.float32, precision=hi)
    R = so.shape[0]
    so = so.reshape(R, -1, 4)
    sd = sd.reshape(R, -1, 4)
    s0o, s0d = so[..., 0], sd[..., 0]
    denom_ok = jnp.abs(s0d) > _DIR_EPS
    t = -s0o / jnp.where(denom_ok, s0d, 1.0)
    p_edges = so[..., 1:] + t[..., None] * sd[..., 1:]
    inside = jnp.all(p_edges >= -_INSIDE_EPS, axis=-1)
    hit = denom_ok & inside & (t >= t_min) & (t <= t_max)
    return t, hit


def _pad_rays(origs, dirs, block):
    R = origs.shape[0]
    pad = (-R) % block
    o = jnp.concatenate([origs, jnp.zeros((pad, 3), origs.dtype)], axis=0)
    d = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)], axis=0)
    return o, d, R


def trace_planes(scene, origs, dirs, t_min: float = 0.0, t_max: float = 1000.0,
                 ray_block: int = 2048, tri_chunk: int = 2048) -> TraceResult:
    """Exact MXU trace: scan all triangle chunks, keep the running nearest."""
    planes_o = jnp.asarray(scene.planes_o)   # (4T, 4)
    planes_d = jnp.asarray(scene.planes_d)   # (4T, 3)
    T = scene.verts.shape[0]
    tri_chunk = min(tri_chunk, T)
    n_tchunks = -(-T // tri_chunk)
    pad_t = n_tchunks * tri_chunk - T
    if pad_t:
        # pad with planes that can never be hit (support normal 0 -> |sd|=0)
        planes_o = jnp.concatenate(
            [planes_o, jnp.zeros((4 * pad_t, 4), jnp.float32)], axis=0)
        planes_d = jnp.concatenate(
            [planes_d, jnp.zeros((4 * pad_t, 3), jnp.float32)], axis=0)
    po = planes_o.reshape(n_tchunks, tri_chunk * 4, 4)
    pd = planes_d.reshape(n_tchunks, tri_chunk * 4, 3)

    o, d, R = _pad_rays(origs, dirs, ray_block)
    n_blocks = o.shape[0] // ray_block

    def block_body(ray_chunk):
        ob, db = ray_chunk
        o_aug = jnp.concatenate([ob, jnp.ones((ob.shape[0], 1), ob.dtype)], -1)

        def tchunk_body(carry, chunk):
            best_t, best_idx = carry
            po_c, pd_c, base = chunk
            t, hit = _plane_hits(o_aug, db, po_c.T, pd_c.T, t_min, t_max)
            t_masked = jnp.where(hit, t, jnp.inf)
            local = jnp.argmin(t_masked, axis=-1)
            local_t = jnp.take_along_axis(t_masked, local[:, None], -1)[:, 0]
            better = local_t < best_t
            best_t = jnp.where(better, local_t, best_t)
            best_idx = jnp.where(better, base + local, best_idx)
            return (best_t, best_idx), None

        # carry init derived from both ray operands AND the scene tables so
        # the scan type-checks inside shard_map (origins/dirs may vary over
        # different mesh axes; the scene may be sharded over a chunk axis)
        zeros = (ob[:, 0] + db[:, 0]) * 0.0 + po[0, 0, 0] * 0.0
        init = (zeros + jnp.inf, zeros.astype(jnp.int32))
        bases = jnp.arange(n_tchunks, dtype=jnp.int32) * tri_chunk
        (best_t, best_idx), _ = jax.lax.scan(tchunk_body, init, (po, pd, bases))
        return best_t, best_idx

    o_blocks = o.reshape(n_blocks, ray_block, 3)
    d_blocks = d.reshape(n_blocks, ray_block, 3)
    best_t, best_idx = jax.lax.map(block_body, (o_blocks, d_blocks))
    best_t = best_t.reshape(-1)[:R]
    best_idx = best_idx.reshape(-1)[:R]
    return _finalize(scene, origs, dirs, best_idx, best_t)


def _ray_aabb(o, inv_d, lo, hi):
    """Slab test: o (R,3), inv_d (R,3), lo/hi (C,3) -> (R,C) t_entry, overlap."""
    t0 = (lo[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    t1 = (hi[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    overlap = (t_far >= jnp.maximum(t_near, 0.0))
    return t_near, overlap


def suggest_k(scene, fraction: float = 0.25, minimum: int = 8) -> int:
    """Heuristic sweep cap for trace_planes_culled when a caller wants to
    bound worst-case latency (k_chunks=None keeps the sweep exact)."""
    c = scene.chunk_aabb_lo.shape[0]
    return max(minimum, min(c, int(c * fraction)))


def trace_planes_culled(scene, origs, dirs, t_min: float = 0.0,
                        t_max: float = 1000.0, ray_block: int = 1024,
                        k_chunks: int | None = None,
                        t_budget=None) -> TraceResult:
    """Ordered chunk sweep with early termination — an XLA-native "BVH-lite".

    Per block of `ray_block` rays:
      1. slab-test every chunk AABB against all rays (VPU), giving
         per-ray entry distances t_near (inf when a ray misses the chunk);
      2. rank chunks by the earliest entry over the block (front-to-back for
         the block as a whole);
      3. sweep chunks in that order inside a `lax.while_loop`, running the
         MXU plane test one chunk at a time, and STOP as soon as every ray's
         current best hit is closer than the nearest entry among its
         remaining chunks (per-ray suffix-min of ranked t_near) — the same
         termination criterion a BVH traversal uses, applied block-wide.

    EXACT for any k_chunks >= the number a block actually needs; `k_chunks`
    only caps the sweep length (None = no cap = always exact). Coherent ray
    blocks (the radar's azimuth-major layout) terminate after a handful of
    chunks.
    """
    planes_o = jnp.asarray(scene.planes_o)
    planes_d = jnp.asarray(scene.planes_d)
    lo = jnp.asarray(scene.chunk_aabb_lo)
    hi = jnp.asarray(scene.chunk_aabb_hi)
    C = lo.shape[0]
    # derive from static shapes — scene.chunk_size is a pytree leaf and is
    # traced (non-concrete) when this runs under jit
    cs = scene.verts.shape[0] // C
    K = min(k_chunks or C, C)
    if k_chunks is not None and K < C:
        import warnings

        warnings.warn(
            f"trace_planes_culled: k_chunks={K} caps the chunk sweep below "
            f"the scene's {C} chunks — the trace is NO LONGER GUARANTEED "
            "EXACT (a hit is missed whenever more than k_chunks chunks "
            "rank closer than it). This opts out of the engines-match-brute "
            "contract; use k_chunks=None unless bounding worst-case sweep "
            "latency is worth approximate results.",
            stacklevel=2)

    # tangents stop at the sweep (lax.while_loop has no reverse-mode rule;
    # the winner is discrete anyway) and flow through _finalize's
    # Moller-Trumbore refinement instead — see trace_pallas_v3
    origs_d, dirs_d = origs, dirs
    sg = jax.lax.stop_gradient
    origs, dirs = sg(origs), sg(dirs)
    t_budget = None if t_budget is None else sg(t_budget)

    po = planes_o.reshape(C, cs * 4, 4)
    pd = planes_d.reshape(C, cs * 4, 3)

    o, d, R = _pad_rays(origs, dirs, ray_block)
    n_blocks = o.shape[0] // ray_block
    # per-ray sweep cap (pruning only; the uniform budget miss-mask is
    # applied centrally in trace/api.py). Pad rays get budget 0.
    bud = jnp.full((R,), t_max, jnp.float32) if t_budget is None \
        else jnp.asarray(t_budget, jnp.float32)
    bud = jnp.concatenate(
        [bud, jnp.zeros((o.shape[0] - R,), jnp.float32)], axis=0)

    def block_body(ray_chunk):
        ob, db, bb = ray_chunk
        RB = ob.shape[0]
        inv_d = 1.0 / jnp.where(jnp.abs(db) > _DIR_EPS, db,
                                jnp.where(db >= 0, _DIR_EPS, -_DIR_EPS))
        t_near, overlap = _ray_aabb(ob, inv_d, lo, hi)          # (RB, C)
        t_near = jnp.where(overlap & (t_near <= jnp.minimum(t_max, bb[:, None])),
                           jnp.maximum(t_near, 0.0), jnp.inf)
        order = jnp.argsort(jnp.min(t_near, axis=0))            # (C,)
        entry_ranked = t_near[:, order]                         # (RB, C)
        # suffix min over ranked chunks: closest possible entry among the
        # chunks not yet visited, per ray
        suffix = jax.lax.associative_scan(
            jnp.minimum, entry_ranked, reverse=True, axis=1)
        suffix = jnp.concatenate(
            [suffix, jnp.full((RB, 1), jnp.inf)], axis=1)       # (RB, C+1)

        o_aug = jnp.concatenate([ob, jnp.ones((RB, 1), ob.dtype)], -1)

        def cond(carry):
            i, best_t, _ = carry
            return (i < K) & jnp.any(best_t > suffix[:, i])

        def body(carry):
            i, best_t, best_idx = carry
            c = order[i]
            po_c = jax.lax.dynamic_index_in_dim(po, c, 0, keepdims=False)
            pd_c = jax.lax.dynamic_index_in_dim(pd, c, 0, keepdims=False)
            t, hit = _plane_hits(o_aug, db, po_c.T, pd_c.T, t_min, t_max)
            t_masked = jnp.where(hit, t, jnp.inf)               # (RB, cs)
            local = jnp.argmin(t_masked, axis=-1)
            local_t = jnp.take_along_axis(t_masked, local[:, None], -1)[:, 0]
            better = local_t < best_t
            best_t = jnp.where(better, local_t, best_t)
            best_idx = jnp.where(better, c * cs + local.astype(jnp.int32),
                                 best_idx)
            return i + 1, best_t, best_idx

        # derive the carry init from BOTH ray operands AND the scene
        # tables: fresh constants (or origin-only derivation) would fail
        # the while_loop's varying-axes type check when this runs inside
        # shard_map with origins/directions varying over different mesh
        # axes, or with the SCENE sharded over a chunk axis
        # (parallel/sharding.py:simulate_frame_scene_sharded)
        zeros = (ob[:, 0] + db[:, 0]) * 0.0 + po[0, 0, 0] * 0.0
        init = (jnp.int32(0), zeros + jnp.inf, zeros.astype(jnp.int32))
        _, best_t, best_idx = jax.lax.while_loop(cond, body, init)
        return best_t, best_idx

    o_blocks = o.reshape(n_blocks, ray_block, 3)
    d_blocks = d.reshape(n_blocks, ray_block, 3)
    b_blocks = bud.reshape(n_blocks, ray_block)
    best_t, best_idx = jax.lax.map(block_body, (o_blocks, d_blocks, b_blocks))
    best_t = best_t.reshape(-1)[:R]
    best_idx = best_idx.reshape(-1)[:R]
    return _finalize(scene, origs_d, dirs_d, best_idx, best_t)
