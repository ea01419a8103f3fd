"""The jitted end-to-end radar frame: pose(s) -> uint8 polar image.

This is the TPU re-architecture of both reference engines:

  * RadarCPU::simulate (RadarCPU.cpp:30-564) — per-azimuth OpenMP loop,
    dynamic wave lists, energy pruning, full noise model;
  * RadarGPU::simulate (RadarGPU.cpp:32-867) — whole-scan batching, 3
    hardcoded passes, x2 buffer doubling, hit masks, no multipath.

The TPU pipeline takes the GPU engine's dense shape and generalizes it to the
CPU engine's full semantics: a static python loop over `n_reflections`
bounces; each pass holds a dense (n_angles, n_samples * 2^pass) wave tensor
with validity masks (energy pruning = mask clears); each pass emits up to two
signals per wave (path return, RadarCPU.cpp:319-323; air-path multipath
return, RadarCPU.cpp:325-360) into dense signal arrays that are scatter-drawn
into the polar image at the end. One frame — cone sampling, every bounce,
shading, binning, denoising, ambient noise, normalization — is ONE jitted XLA
program with static shapes throughout.

Differentiability: the image is differentiable w.r.t. material properties and
beam width (through signal strengths/times); used by opti/.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from radarays_ros_tpu.geom.scene import SceneArrays
from radarays_ros_tpu.image.draw import (
    apply_ambient_noise,
    draw_signals,
    normalize_to_u8,
)
from radarays_ros_tpu.sim.config import RadarModelConfig, RadarParams
from radarays_ros_tpu.trace.api import trace
from radarays_ros_tpu.utils.transforms import azimuth_angles, pose_matrix, rotz
from radarays_ros_tpu.wave.cone import sample_cone_local
from radarays_ros_tpu.wave.fresnel import (
    back_reflection_shader,
    cook_torrance_shader,
    fresnel_split,
    get_incidence_angle,
)
from radarays_ros_tpu.wave.types import Waves, broadcast_waves, make_start_wave_attrs


class FrameResult(NamedTuple):
    image_u8: jnp.ndarray     # (n_cells, n_angles) uint8 polar image
    image_float: jnp.ndarray  # (n_angles, n_cells) float32 pre-quantization
    max_val: jnp.ndarray      # (n_angles,) per-column raw signal maximum


def _shade(cfg: RadarModelConfig, params: RadarParams, mat_id, angle, energy):
    """Back-reflection shading with the configured reflection model.

    Blinn-Phong-polynomial call-site convention: material (ambient, diffuse,
    specular) -> shader (diffuse, specular_fac, specular_exp)
    (RadarCPU.cpp:310-316). The cook_torrance option reuses the same table as
    (k_diffuse=ambient, roughness=diffuse, f0 from specular) for dev/flex
    parity via the unchanged material API.
    """
    m = params.materials
    if cfg.reflection_model == "cook_torrance":
        return cook_torrance_shader(
            angle, energy,
            roughness=jnp.maximum(m.diffuse[mat_id], 1e-3),
            fresnel_f0=jnp.clip(m.specular[mat_id] / 3000.0, 0.0, 1.0),
            k_diffuse=jnp.clip(m.ambient[mat_id], 0.0, 1.0),
        )
    return back_reflection_shader(
        angle, energy,
        diffuse=m.ambient[mat_id],
        specular_fac=m.diffuse[mat_id],
        specular_exp=m.specular[mat_id],
    )


def _bounce(cfg: RadarModelConfig, params: RadarParams, scene: SceneArrays,
            waves: Waves, sensor_pos, pass_id: int):
    """One reflect/refract pass over a dense wave tensor.

    Returns (next_waves with doubled sample axis, signal times/strengths/valid
    arrays of shape (A, N) per signal kind).
    """
    A, N = waves.batch_shape

    from radarays_ros_tpu.trace.api import resolve_engine

    # Per-ray trace budget: the polar image only covers n_cells*resolution
    # meters of one-way signal distance (cell = 0.3*t/2/res, out-of-range
    # cells dropped, image/draw.py), and travel time only grows — so a hit
    # whose arrival time is already past the image limit can contribute
    # nothing, nor can any of its descendants. Clamping the trace there is
    # EXACT w.r.t. the final image and is the dominant large-scene win: the
    # sweep radius becomes the image range (~200 m for the KAIST preset)
    # instead of t_max (1000 m), shrinking chunk visits quadratically.
    # (The reference traces its full OnDn range [0,1000] and drops the
    # out-of-image signals in binning, RadarCPU.cpp:410-413.)
    weights, mode = cfg.denoiser()
    slack = 0 if weights is None else len(weights)  # splat reach, in cells
    t_lim = (cfg.n_cells + slack) * cfg.resolution / 0.3   # max arrival [ns]
    if cfg.record_multi_path:
        # the multipath air return travels hit->sensor directly, which can
        # be arbitrarily short — only time*1 (not *2) bounds its signal
        t_lim = 2.0 * t_lim
    budget = jnp.maximum(t_lim - waves.time, 0.0) * waves.velocity

    engine = resolve_engine(cfg.trace_engine)
    # per-hit material lookup: the object->material map gather by hit index
    # runs at ~1.5 GB/s as an XLA gather (~2.7 ms per bounce at 400k rays);
    # pallas3 fetches a per-TRIANGLE material row in-kernel instead. The
    # (T,) table build below is one gather per jit call (hoisted across the
    # frame batch and the bounce loop — obj_ids and the map are invariant).
    tri_aux = None
    if engine == "pallas3":
        if cfg.trace_aux_baked:
            # scene.tri_table_t already carries the map in its aux slot
            # (geom/scene.py:bake_tri_aux, managed by sim/radar.py) — skip
            # the gather AND the in-jit table copy it forces downstream
            tri_aux = "baked"
        else:
            tri_aux = params.object_materials.astype(jnp.float32)[
                jnp.clip(jnp.asarray(scene.obj_ids), 0,
                         params.object_materials.shape[0] - 1)]
    res = trace(
        scene, waves.orig, waves.dir,
        engine=engine,
        t_min=0.0,
        t_max=1000.0,
        t_budget=budget,
        tri_aux=tri_aux,
        ray_block=cfg.trace_ray_block,
        **({"prep_group": cfg.trace_prep_group}
           if engine == "pallas3" and cfg.trace_prep_group != 0 else {}),
        **({"two_phase_cap": cfg.trace_two_phase_cap}
           if engine == "pallas3" and cfg.trace_two_phase_cap is not None
           else {}),
        **({"argmin_mode": cfg.trace_argmin_mode}
           if engine == "pallas3" else {}),
        **({"term_stride": cfg.trace_term_stride}
           if engine == "pallas3" and cfg.trace_term_stride != 1 else {}),
        **({"tri_chunk": cfg.trace_tri_chunk} if engine == "mxu" else {}),
        **({"k_chunks": cfg.trace_k_chunks} if engine == "culled" else {}),
    )
    if cfg.trace_scene_axis is not None:
        # chunk-sharded scene (shard_map): each device traced its chunk
        # wedge only; merge the per-ray winners across the scene axis
        from radarays_ros_tpu.trace.api import combine_trace_shards

        res = combine_trace_shards(res, cfg.trace_scene_axis)

    alive = waves.valid & res.hit
    safe_t = jnp.where(alive, res.t, 0.0)
    incidence = waves.move(safe_t)

    # material flip: air -> hit object's material, material -> air
    # (RadarCPU.cpp:264-271)
    in_air = waves.material_id == cfg.material_id_air
    # Miss lanes: the aux path yields material 0 (aux = 0.0 on miss), the
    # gather path yields whatever INVALID_OBJ_ID clips to — refr_mat/v2 on
    # those lanes are DEAD BY CONSTRUCTION (every consumer — fresnel
    # children, _shade — is gated by alive/refl_valid, and alive requires
    # res.hit), so the two paths are equivalent; don't add consumers of
    # refr_mat/v2 that aren't alive-gated.
    if res.aux is not None:
        hit_mat = res.aux.astype(jnp.int32)
    else:
        obj = jnp.clip(res.obj_id, 0, params.object_materials.shape[0] - 1)
        hit_mat = params.object_materials[obj]
    refr_mat = jnp.where(in_air, hit_mat, cfg.material_id_air)
    same = refr_mat == waves.material_id
    v2 = jnp.where(same, waves.velocity, params.materials.velocity[refr_mat])

    fres = fresnel_split(
        res.normal, waves.dir, incidence.energy, incidence.polarization,
        incidence.velocity, v2,
    )

    thresh = cfg.wave_energy_threshold

    # --- reflection child (stays in the incidence medium)
    refl_valid = alive & (fres.reflection_energy > thresh)
    reflection = incidence._replace(
        dir=fres.reflection_dir,
        energy=fres.reflection_energy,
        valid=refl_valid,
    ).move(cfg.skip_dist)

    # --- refraction child (enters the refraction medium). When every
    # non-air material is opaque (velocity 0 — e.g. the tuned MulRan preset,
    # cfg/mulran_kaist_dyncfg.yaml), Fresnel gives Teff = 0 and the
    # refraction branch is all-dead; cfg.opaque_materials skips carrying it,
    # halving the wave tensor per bounce — the static-shape equivalent of
    # the reference CPU engine's dynamic energy pruning
    # (RadarCPU.cpp:364-370).
    if not cfg.opaque_materials:
        refr_dir_ok = jnp.sum(
            fres.refraction_dir * fres.refraction_dir, axis=-1) > 0.25
        refr_valid = alive & (fres.refraction_energy > thresh) & refr_dir_ok
        refraction = incidence._replace(
            dir=fres.refraction_dir,
            energy=fres.refraction_energy,
            velocity=jnp.where(refr_valid, v2, incidence.velocity),
            material_id=jnp.where(refr_valid, refr_mat, incidence.material_id),
            valid=refr_valid,
        ).move(cfg.skip_dist)

    # --- path-return signal (RadarCPU.cpp:302-323): only waves in air, only
    # recorded on pass 0 unless record_multi_reflection. pass_id may be a
    # traced scan index (the opaque fast path runs bounces under lax.scan).
    inc_angle = get_incidence_angle(res.normal, waves.dir)
    ret_energy = _shade(cfg, params, refr_mat, inc_angle, fres.reflection_energy)
    sig_gate = refl_valid & in_air
    static_pass = isinstance(pass_id, int)
    if static_pass:
        path_valid = sig_gate & bool((pass_id == 0) or cfg.record_multi_reflection)
    else:
        path_valid = sig_gate & (cfg.record_multi_reflection | (pass_id == 0))
    path_time = incidence.time * 2.0
    path_strength = ret_energy

    signals = [(path_time, path_strength, path_valid)]

    # --- multipath air-return signal (RadarCPU.cpp:325-360): hit reflects
    # straight through air back to the sensor.
    if cfg.record_multi_path and (not static_pass or pass_id > 0):
        to_sensor = incidence.orig - sensor_pos[:, None, :]
        dist = jnp.linalg.norm(to_sensor, axis=-1)
        dir_s2h = to_sensor / jnp.maximum(dist, 1e-12)[..., None]
        time_to_sensor = dist / reflection.velocity
        view_scalar = jnp.sum(waves.dir * dir_s2h, axis=-1)
        angle_air = jnp.arccos(jnp.clip(
            jnp.sum(-fres.reflection_dir * dir_s2h, axis=-1), -1.0, 1.0))
        air_energy = _shade(cfg, params, refr_mat, angle_air, fres.reflection_energy)
        air_valid = sig_gate & (view_scalar > cfg.multipath_threshold)
        if not static_pass:
            air_valid = air_valid & (pass_id > 0)
        signals.append((incidence.time + time_to_sensor, air_energy, air_valid))

    if cfg.opaque_materials:
        next_waves = reflection
    else:
        next_waves = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=1), reflection, refraction
        )
    return next_waves, signals


def collect_signals(scene: SceneArrays, params: RadarParams,
                    cfg: RadarModelConfig, waves: Waves, sensor_pos):
    """Run all bounce passes; return dense (A, N) (times, strengths, valid).

    Shape-agnostic over the wave batch (the 2-D sharded path runs it on an
    (A_local, S_local) wedge, parallel/sharding.py). When opaque_materials
    holds, every pass keeps the (A, S) shape (no refraction children), so
    the bounce loop rolls up into ONE lax.scan iteration body — a ~4x
    smaller XLA graph and a single Mosaic trace kernel to compile.
    """
    A = waves.batch_shape[0]
    if cfg.opaque_materials:
        def body(w, i):
            w2, signals = _bounce(cfg, params, scene, w, sensor_pos, i)
            return w2, tuple(signals)

        _, sigs = jax.lax.scan(
            body, waves, jnp.arange(cfg.n_reflections, dtype=jnp.int32))
        # each kind: (P, A, N) -> (A, P*N)
        def flat(x):
            return x.transpose(1, 0, 2).reshape(A, -1)

        times = jnp.concatenate([flat(t) for t, _, _ in sigs], axis=1)
        strengths = jnp.concatenate([flat(s) for _, s, _ in sigs], axis=1)
        valid = jnp.concatenate([flat(v) for _, _, v in sigs], axis=1)
    else:
        all_times, all_strengths, all_valid = [], [], []
        for pass_id in range(cfg.n_reflections):
            waves, signals = _bounce(cfg, params, scene, waves, sensor_pos,
                                     pass_id)
            for t, s, v in signals:
                all_times.append(t)
                all_strengths.append(s)
                all_valid.append(v)

        times = jnp.concatenate(all_times, axis=1)
        strengths = jnp.concatenate(all_strengths, axis=1)
        valid = jnp.concatenate(all_valid, axis=1)
    return times, strengths, valid


def simulate_frame(scene: SceneArrays, params: RadarParams,
                   cfg: RadarModelConfig, poses, key) -> FrameResult:
    """Simulate one full rotating radar frame.

    Args:
      scene:  device scene arrays (Scene.device_arrays()).
      params: dynamic RadarParams (materials, object_materials, beam_width).
      cfg:    static RadarModelConfig (hashable; jit static argument).
      poses:  (7,) single sensor pose, or (n_angles, 7) per-azimuth poses
              (include_motion equivalent, RadarCPU.cpp:190-196).
      key:    jax PRNG key (split into cone + noise streams), or an explicit
              (cone_key, noise_key) tuple so the caller can hold the cone
              stream fixed across frames (the reference's cached
              m_waves_start, RadarCPU.cpp:136-145) while refreshing noise.

    Returns FrameResult with the (n_cells, n_angles) uint8 polar image.
    """
    A = cfg.n_angles
    S = cfg.n_samples
    if isinstance(key, (tuple, list)):
        key_cone, key_noise = key
    else:
        key_cone, key_noise = jax.random.split(jnp.asarray(key))

    poses = jnp.asarray(poses, jnp.float32)
    if poses.ndim == 1:
        poses = jnp.broadcast_to(poses[None, :], (A, 7))

    # transmit cone in the beam-local frame (RadarCPU.cpp:136-145)
    local_dirs = sample_cone_local(
        key_cone, params.beam_width, S, cfg.beam_sample_dist,
        cfg.beam_sample_dist_normal_p_in_cone,
    )  # (S, 3)

    # beam frame -> map frame: R_am = R_sm @ Rz(theta_a) (RadarCPU.cpp:198-209)
    R_sm, t_sm = pose_matrix(poses)            # (A, 3, 3), (A, 3)
    R_as = rotz(azimuth_angles(A))             # (A, 3, 3)
    # HIGHEST: the default TPU matmul precision truncates the f32
    # rotation entries to bf16 (~0.4% relative) before the product —
    # the same defect class the beam einsum below pins
    R_am = jnp.matmul(R_sm, R_as, precision=jax.lax.Precision.HIGHEST)
    # precision=HIGHEST: XLA's DEFAULT contraction precision on TPU
    # truncates f32 inputs to bf16 — beam directions would quantize at
    # ~0.4% relative, visibly moving every hit point (trace/planes.py)
    dirs0 = jnp.einsum("aij,sj->asi", R_am, local_dirs,
                       precision=jax.lax.Precision.HIGHEST)
    sensor_pos = t_sm + jnp.array([0.0, 0.0, cfg.z_offset], jnp.float32)

    waves = broadcast_waves(
        sensor_pos[:, None, :], dirs0, make_start_wave_attrs(
            material_id=cfg.material_id_air,
        ), (A, S),
    )

    times, strengths, valid = collect_signals(scene, params, cfg, waves,
                                              sensor_pos)

    weights, mode = cfg.denoiser()
    img, max_val = draw_signals(
        times, strengths, valid,
        n_cells=cfg.n_cells, resolution=cfg.resolution,
        denoise_weights=weights, denoise_mode=mode,
        method=cfg.draw_method,
    )

    img = img * cfg.energy_max  # RadarCPU.cpp:453

    cols = (cfg.scroll_image + jnp.arange(A, dtype=jnp.int32)) % A
    img = apply_ambient_noise(
        img, max_val, cols, key_noise,
        mode=cfg.ambient_noise,
        resolution=cfg.resolution,
        at_signal_0=cfg.ambient_noise_at_signal_0,
        at_signal_1=cfg.ambient_noise_at_signal_1,
        energy_max=cfg.ambient_noise_energy_max,
        energy_min=cfg.ambient_noise_energy_min,
        energy_loss=cfg.ambient_noise_energy_loss,
        perlin_scale_low=cfg.ambient_noise_perlin_scale_low,
        perlin_scale_high=cfg.ambient_noise_perlin_scale_high,
        perlin_p_low=cfg.ambient_noise_perlin_p_low,
    )

    image_u8 = normalize_to_u8(img, max_val, cfg.signal_max)

    # place azimuth a at column (scroll_image + a) % A (RadarCPU.cpp:457,542)
    image_u8 = jnp.zeros_like(image_u8).at[cols].set(image_u8).T
    return FrameResult(image_u8=image_u8, image_float=img, max_val=max_val)


simulate_frame_jit = jax.jit(simulate_frame, static_argnames=("cfg",))


def float_u8_image(res: FrameResult, cfg: RadarModelConfig) -> jnp.ndarray:
    """Differentiable float stand-in for `image_u8`, on the 0..255 scale.

    `image_u8` goes through jnp.round + an integer cast (image/draw.py:
    normalize_to_u8), both of which have identically-zero gradients — any
    loss computed on it silently kills gradient-based optimization. This
    reproduces the same per-column signal_max/max_val normalization, clip
    and scroll permutation (RadarCPU.cpp:533-542) WITHOUT the quantization,
    so |float_u8_image - image_u8| <= 0.5 per pixel while gradients flow
    through image_float and max_val. Shape (n_cells, n_angles), like
    image_u8.
    """
    mv = res.max_val
    scale = jnp.where(mv > 0.0, cfg.signal_max / jnp.where(mv > 0.0, mv, 1.0),
                      0.0)
    img = jnp.clip(res.image_float * scale[:, None], 0.0, 255.0)
    cols = (cfg.scroll_image + jnp.arange(cfg.n_angles, dtype=jnp.int32)) \
        % cfg.n_angles
    return jnp.zeros_like(img).at[cols].set(img).T


def simulate_frames(scene: SceneArrays, params: RadarParams,
                    cfg: RadarModelConfig, poses_batch, keys) -> FrameResult:
    """Batched frames: vmap the whole pipeline over a pose/key batch.

    For trajectory replay and serving, batching N frames into one XLA
    program amortizes dispatch and keeps the MXU fed (the reference
    processes one scan at a time end-to-end; there is no equivalent).

    Args:
      poses_batch: (N, 7) one pose per frame, or (N, n_angles, 7).
      keys: (N,) jax PRNG keys (one per frame's noise stream).

    Returns FrameResult with a leading N axis on every field.
    """
    def one(pose, key):
        return simulate_frame(scene, params, cfg, pose, key)

    return jax.vmap(one)(jnp.asarray(poses_batch, jnp.float32),
                         jnp.asarray(keys))


simulate_frames_jit = jax.jit(simulate_frames, static_argnames=("cfg",))
