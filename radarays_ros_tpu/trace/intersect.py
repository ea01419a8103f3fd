"""Brute-force Moller-Trumbore tracer — the correctness oracle.

Every ray is tested against every triangle with the classic Moller-Trumbore
barycentric test, blocked over rays to bound memory. This is the semantic
ground truth the MXU/culled/Pallas engines are tested against (mirrors the
role Embree-CPU plays for the reference GPU engine, CMakeLists.txt:208
"TESTS MAINLY PROTOTYPED WITH CPU").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from radarays_ros_tpu.geom.scene import INVALID_OBJ_ID
from radarays_ros_tpu.trace.api import TraceResult

_DET_EPS = 1e-12


def _mt_block(o, d, v0, e1, e2, t_min, t_max):
    """Moller-Trumbore for a block of rays vs all triangles.

    o, d: (R, 3); v0, e1, e2: (T, 3). Returns (t, hit) with shape (R, T).
    """
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])          # (R, T, 3)
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)            # (R, T)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = o[:, None, :] - v0[None, :, :]                    # (R, T, 3)
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= t_min)
        & (t <= t_max)
    )
    return t, hit


def trace_brute(scene, origs, dirs, t_min: float = 0.0, t_max: float = 1000.0,
                ray_block: int = 1024) -> TraceResult:
    """Nearest-hit trace of (R, 3) rays against the whole triangle soup.

    t_max default 1000 matches the reference's OnDn model range
    (radar_algorithms.cpp:157-158).
    """
    verts = jnp.asarray(scene.verts)
    v0 = verts[:, 0]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    normals = jnp.asarray(scene.normals)
    obj_ids = jnp.asarray(scene.obj_ids)

    R = origs.shape[0]
    pad = (-R) % ray_block
    o = jnp.concatenate([origs, jnp.zeros((pad, 3), origs.dtype)], axis=0)
    d = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)], axis=0)
    n_blocks = o.shape[0] // ray_block

    def body(ray_chunk):
        ob, db = ray_chunk
        t, hit = _mt_block(ob, db, v0, e1, e2, t_min, t_max)
        t_masked = jnp.where(hit, t, jnp.inf)
        best = jnp.argmin(t_masked, axis=-1)
        best_t = jnp.take_along_axis(t_masked, best[:, None], axis=-1)[:, 0]
        return best, best_t

    o_blocks = o.reshape(n_blocks, ray_block, 3)
    d_blocks = d.reshape(n_blocks, ray_block, 3)
    best, best_t = jax.lax.map(body, (o_blocks, d_blocks))
    best = best.reshape(-1)[:R]
    best_t = best_t.reshape(-1)[:R]

    hit = jnp.isfinite(best_t)
    n = normals[best]
    # orient the normal against the incoming ray (see wave/fresnel.py note)
    n = jnp.where(jnp.sum(n * dirs, axis=-1, keepdims=True) > 0.0, -n, n)
    return TraceResult(
        hit=hit,
        t=jnp.where(hit, best_t, jnp.inf),
        normal=jnp.where(hit[:, None], n, 0.0),
        obj_id=jnp.where(hit, obj_ids[best], INVALID_OBJ_ID),
    )
