"""Ray-reflection debugging: the `ray_reflection_test` node, data-first.

The reference's debug node (src/ray_reflection_test.cpp:169-354) traces a
controllable beam through the mesh for B bounces and publishes each segment
as an rviz LINE_LIST marker colored by medium (red = air, green = inside a
material) with optional energy alpha. Here the same trace produces a plain
data structure (JSON-able dict) that the CLI dumps and tests assert on —
"visual debugging" with assertable output (SURVEY.md §4.1).

Beam modes (RayReflection.cfg):
  * "single" — one ray at `yaw` (ray_reflection_test.cpp:196-205);
  * "fan"    — n_fan rays spread over 360 deg (shoot_all_directions,
               ray_reflection_test.cpp:207-222);
  * "cone"   — the radar beam cone sampled with the configured distribution
               (ray_reflection_test.cpp:224-240).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from radarays_ros_tpu.sim.config import RadarModelConfig, RadarParams
from radarays_ros_tpu.trace.api import trace
from radarays_ros_tpu.utils.transforms import pose_matrix, rotz
from radarays_ros_tpu.wave.cone import sample_cone_local
from radarays_ros_tpu.wave.fresnel import fresnel_split
from radarays_ros_tpu.wave.types import Waves, broadcast_waves, make_start_wave_attrs


def _initial_dirs(cfg: RadarModelConfig, params: RadarParams, yaw: float,
                  mode: str, n_fan: int, seed: int) -> jnp.ndarray:
    if mode == "single":
        return jnp.asarray(
            [[np.cos(yaw), np.sin(yaw), 0.0]], jnp.float32)
    if mode == "fan":
        a = yaw + np.arange(n_fan) * (2 * np.pi / n_fan)
        return jnp.asarray(
            np.stack([np.cos(a), np.sin(a), np.zeros_like(a)], -1), jnp.float32)
    if mode == "cone":
        local = sample_cone_local(
            jax.random.PRNGKey(seed), params.beam_width, cfg.n_samples,
            cfg.beam_sample_dist, cfg.beam_sample_dist_normal_p_in_cone)
        return jnp.einsum("ij,sj->si", rotz(jnp.float32(yaw)), local,
                          precision=jax.lax.Precision.HIGHEST)
    raise ValueError(f"unknown beam mode {mode!r}")


def trace_debug_rays(scene_arrays, params: RadarParams, cfg: RadarModelConfig,
                     pose, *, yaw: float = 0.0, n_bounces: int = 3,
                     mode: str = "single", n_fan: int = 360,
                     seed: int = 0) -> Dict:
    """Trace a debug beam for n_bounces; return the segment list.

    Returns {"segments": [{bounce, start, end, energy, material_id, medium,
    kind}, ...], "n_rays": N}; `kind` is "reflection"/"refraction"/"primary",
    `medium` is "air"/"material" (the red/green coloring of
    ray_reflection_test.cpp:277-307). Untermimated rays (no hit) are dropped,
    matching the reference's marker output.
    """
    pose = jnp.asarray(pose, jnp.float32)
    R_sm, t_sm = pose_matrix(pose)
    dirs0 = jnp.einsum("ij,sj->si", R_sm, _initial_dirs(
        cfg, params, yaw, mode, n_fan, seed),
        precision=jax.lax.Precision.HIGHEST)
    N = dirs0.shape[0]

    waves = broadcast_waves(
        jnp.broadcast_to(t_sm, (1, N, 3)), dirs0[None],
        make_start_wave_attrs(material_id=cfg.material_id_air), (1, N))
    kinds = ["primary"] * N

    segments = []
    for bounce in range(n_bounces):
        res = trace(scene_arrays, waves.orig, waves.dir,
                    engine=cfg.trace_engine, ray_block=cfg.trace_ray_block)
        alive = waves.valid & res.hit
        safe_t = jnp.where(alive, res.t, 0.0)
        incidence = waves.move(safe_t)

        # record segments of this bounce
        orig = np.asarray(waves.orig[0])
        endp = np.asarray(incidence.orig[0])
        energy = np.asarray(waves.energy[0])
        mat = np.asarray(waves.material_id[0])
        ok = np.asarray(alive[0])
        for i in range(orig.shape[0]):
            if not ok[i]:
                continue
            segments.append(dict(
                bounce=bounce,
                start=[round(float(v), 6) for v in orig[i]],
                end=[round(float(v), 6) for v in endp[i]],
                energy=round(float(energy[i]), 6),
                material_id=int(mat[i]),
                medium="air" if int(mat[i]) == cfg.material_id_air else "material",
                kind=kinds[i],
            ))

        if bounce == n_bounces - 1:
            break

        # split (batch fresnel over the velocity table,
        # ray_reflection_test.cpp:320-337)
        in_air = waves.material_id == cfg.material_id_air
        obj = jnp.clip(res.obj_id, 0, params.object_materials.shape[0] - 1)
        refr_mat = jnp.where(in_air, params.object_materials[obj],
                             cfg.material_id_air)
        same = refr_mat == waves.material_id
        v2 = jnp.where(same, waves.velocity,
                       params.materials.velocity[refr_mat])
        fres = fresnel_split(res.normal, waves.dir, incidence.energy,
                             incidence.polarization, incidence.velocity, v2)
        thresh = cfg.wave_energy_threshold
        refl = incidence._replace(
            dir=fres.reflection_dir, energy=fres.reflection_energy,
            valid=alive & (fres.reflection_energy > thresh),
        ).move(cfg.skip_dist)
        refr_ok = jnp.sum(fres.refraction_dir**2, axis=-1) > 0.25
        refr = incidence._replace(
            dir=fres.refraction_dir, energy=fres.refraction_energy,
            velocity=jnp.where(refr_ok, v2, incidence.velocity),
            material_id=jnp.where(refr_ok, refr_mat, incidence.material_id),
            valid=alive & (fres.refraction_energy > thresh) & refr_ok,
        ).move(cfg.skip_dist)
        waves = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=1), refl, refr)
        kinds = ["reflection"] * len(kinds) + ["refraction"] * len(kinds)

    return {"segments": segments, "n_rays": int(N)}


def segments_to_polylines(result: Dict):
    """Group segments into per-medium polyline lists for plotting."""
    out = {"air": [], "material": []}
    for seg in result["segments"]:
        out[seg["medium"]].append((seg["start"], seg["end"], seg["energy"]))
    return out
