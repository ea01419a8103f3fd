"""Configuration model: the reference's IDL + dynamic_reconfigure surface.

Maps the reference interface definitions onto dataclasses/pytrees:

  * `Materials`        <- RadarMaterial.msg / RadarMaterials.msg
                          (float32 velocity, ambient, diffuse, specular per
                          material; msg/RadarMaterial.msg:1-4) as SoA arrays.
  * `RadarParams`      <- RadarParams.msg = materials + model
                          {beam_width, n_samples, n_reflections}
                          (msg/RadarModel.msg:1-3). beam_width and the
                          material table are DYNAMIC (differentiable, no
                          recompile); n_samples / n_reflections are static.
  * `RadarModelConfig` <- the 31 dynamic_reconfigure knobs of
                          cfg/RadarModel.cfg:11-85 with identical names and
                          defaults. A frozen, hashable dataclass used as a
                          static jit argument: changing a value recompiles
                          the frame program (the analog of the reference's
                          resampling/reconfigure path, Radar.cpp:188-218).
  * `AmbientNoiseParams` <- radar_types.h:123-131 defaults.

Defaults for `default_params()` mirror ros_helper.h:21-35 (beam width 8 deg,
200 samples, 2 reflections, single air material).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class Materials(NamedTuple):
    """SoA material table (dynamic pytree — differentiable)."""

    velocity: jnp.ndarray  # (M,) wave speed in medium [m/ns]
    ambient: jnp.ndarray   # (M,) back-reflection base term
    diffuse: jnp.ndarray   # (M,) back-reflection cosine factor
    specular: jnp.ndarray  # (M,) back-reflection cosine exponent

    @staticmethod
    def from_list(entries: Sequence[dict]) -> "Materials":
        """Build from a list of dicts with velocity/ambient/diffuse/specular
        (the structured `materials:` YAML list, config/oru4_test.yaml)."""
        def col(k):
            return jnp.asarray([float(e.get(k, 0.0)) for e in entries], jnp.float32)
        return Materials(col("velocity"), col("ambient"), col("diffuse"), col("specular"))

    @staticmethod
    def air_only() -> "Materials":
        return Materials.from_list([
            dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0),
        ])

    @property
    def n(self) -> int:
        return self.velocity.shape[0]


class RadarParams(NamedTuple):
    """Dynamic simulation parameters (RadarParams.msg equivalent)."""

    materials: Materials
    object_materials: jnp.ndarray  # (n_objects,) int32 object -> material id
    beam_width: jnp.ndarray        # scalar float32 [radians]

    @staticmethod
    def make(materials: Materials, object_materials, beam_width_deg: float = 8.0):
        return RadarParams(
            materials=materials,
            object_materials=jnp.asarray(object_materials, jnp.int32),
            beam_width=jnp.float32(np.deg2rad(beam_width_deg)),
        )


@dataclasses.dataclass(frozen=True)
class AmbientNoiseParams:
    """Defaults of radar_types.h:123-131 (used by the reference GPU path)."""

    noise_at_signal_0: float = 0.1
    noise_at_signal_1: float = 0.03
    noise_energy_min: float = 0.05
    noise_energy_max: float = 0.08
    noise_energy_loss: float = 0.05
    resolution: float = 0.0595238


@dataclasses.dataclass(frozen=True)
class RadarModelConfig:
    """Static frame configuration (hashable; used as a jit static argument).

    Field names and defaults track cfg/RadarModel.cfg:11-85 one-to-one; extra
    TPU-specific fields are grouped at the bottom.
    """

    # --- model settings (cfg/RadarModel.cfg:11-16)
    z_offset: float = 0.0
    range_min: float = 0.0
    range_max: float = 600.0
    resolution: float = 0.0438
    n_cells: int = 3424

    # --- simulation settings (cfg/RadarModel.cfg:19-29)
    n_samples: int = 10
    beam_sample_dist: int = 2                      # 0..3 = D1..D4
    beam_sample_dist_normal_p_in_cone: float = 0.8
    n_reflections: int = 4

    energy_min: float = 0.0
    energy_max: float = 0.5
    signal_max: float = 120.0

    # --- signal denoising (cfg/RadarModel.cfg:38-51)
    signal_denoising: int = 1                      # 0 none, 1 tri, 2 gauss, 3 MB
    signal_denoising_triangular_width: int = 50
    signal_denoising_triangular_mode: float = 0.35
    signal_denoising_gaussian_width: int = 50
    signal_denoising_gaussian_mode: float = 0.5
    signal_denoising_mb_width: int = 50
    signal_denoising_mb_mode: float = 0.4

    # --- ambient noise (cfg/RadarModel.cfg:54-70)
    ambient_noise: int = 2                         # 0 none, 1 uniform, 2 perlin
    ambient_noise_at_signal_0: float = 0.3
    ambient_noise_at_signal_1: float = 0.03
    ambient_noise_energy_max: float = 0.5
    ambient_noise_energy_min: float = 0.1
    ambient_noise_energy_loss: float = 0.05
    ambient_noise_uniform_max: float = 0.15
    ambient_noise_perlin_scale_low: float = 0.05
    ambient_noise_perlin_scale_high: float = 0.2
    ambient_noise_perlin_p_low: float = 0.9

    # --- debugging (cfg/RadarModel.cfg:81-85)
    scroll_image: int = 0
    multipath_threshold: float = 0.5
    record_multi_reflection: bool = True
    record_multi_path: bool = False
    include_motion: bool = False

    # --- radar geometry (Radar.cpp:27-32) + engine knobs (TPU-specific).
    # "auto" resolves per backend to the tuned production path — trace
    # engine "pallas3" + draw "pallas" on TPU, "culled" + "scatter"
    # elsewhere (docs/PERFORMANCE.md) — so the quickstart hits the fast path
    # unmodified. opaque_materials is auto-set by Radar when the material
    # table proves it exact.
    n_angles: int = 400
    material_id_air: int = 0
    wave_energy_threshold: float = 0.001           # Radar.cpp:24
    skip_dist: float = 0.001                       # RadarCPU.cpp:374
    reflection_model: str = "blinn_phong"          # or "cook_torrance" (dev/flex)
    opaque_materials: bool = False                 # all velocities 0: drop the
    #   (provably dead) refraction branch, halving wave growth per bounce
    draw_method: str = "auto"                      # auto | scatter | sort | pallas
    trace_engine: str = "auto"                     # auto | brute | mxu | culled | pallas3
    trace_ray_block: int = 2048
    trace_tri_chunk: int = 2048
    # culled-engine sweep cap. None (default) keeps the sweep EXACT; any
    # smaller cap trades exactness for bounded worst-case latency and makes
    # trace_planes_culled emit a loud UserWarning (the engines-match-brute
    # contract only holds uncapped).
    trace_k_chunks: Optional[int] = None
    # SCENE sharding: name of the shard_map mesh axis the scene's chunk
    # tables are partitioned over (geom/scene.py:shard_scene_arrays). When
    # set, every bounce's trace results are merged across that axis with
    # one min-reduce collective (trace/api.py:combine_trace_shards). Only
    # meaningful inside shard_map (parallel/sharding.py:
    # simulate_frame_scene_sharded); None = unsharded scene.
    trace_scene_axis: Optional[str] = None
    # pallas3 culling supergroup (chunks ranked/DMA'd together). 0 = derive
    # from scene size (trace/pallas_trace.py:_auto_prep_group): 1 for
    # <=~3M-triangle scenes (best on dense scenes — coarser culling
    # multiplies kernel work faster than it cuts prep), rising to 4-8
    # beyond so the per-block chunk-entry table stays inside the prep
    # kernel's VMEM scope (chunk_size stays 256 — the sweep's matmul
    # tile). Set explicitly to override.
    trace_prep_group: int = 0
    # The scene's tri_table_t already carries the object->material map baked
    # into its aux slot (geom/scene.py:bake_tri_aux) — the pipeline then
    # passes tri_aux="baked" instead of gathering the (T,) map per jit call
    # (~7 ms/20-frame batch at 1M tris) and copying the (48, T) table.
    # Managed by sim/radar.py:_bake_aux, which re-bakes whenever materials
    # change; set it yourself only if you baked the table yourself.
    trace_aux_baked: bool = False
    # pallas3 two-phase requeue cap [m] (trace(two_phase_cap=...)): phase 1
    # sweeps every ray with its budget capped here; unresolved lanes are
    # compacted and re-traced at full budget. EXACT (parity-tested vs
    # brute); 2.9-4x on miss-heavy/incoherent ray sets, neutral-to-slower
    # on dense scenes whose image-range budgets already bound the sweep —
    # set it for sparse scenes where later-bounce rays often escape.
    trace_two_phase_cap: Optional[float] = None
    # pallas3 winner-row argmin placement (VERDICT r4 #4 VPU levers):
    # "visit" = classic per-visit argmin; "gated" (default) = argmin only
    # on visits that improve some lane — measured -3.6% marginal trace
    # and +4.8% frame Hz at 1M triangles (round 5); "defer" = argmin
    # recovered in the gated winner-fetch pass (measured dead-end: +5.5%
    # marginal). All three are EXACT with identical tie-breaks
    # (tests/test_trace.py::test_pallas_v3_argmin_mode_bit_parity).
    trace_argmin_mode: str = "gated"
    # pallas3 only: evaluate the block-wide early-termination test every
    # Nth chunk visit (1 = every visit). Any stride is EXACT — skipping a
    # check only terminates later, and extra front-to-back visits are
    # idempotent (trace/pallas_trace.py:trace_pallas_v3 docstring); >1
    # trades <= N-1 extra visits/block for N-fold fewer vector->scalar
    # termination syncs.
    trace_term_stride: int = 1

    def denoiser(self) -> Tuple[Optional[np.ndarray], int]:
        """Use-time denoise kernel + mode (see image/denoise.py)."""
        from radarays_ros_tpu.image.denoise import build_denoiser

        if self.signal_denoising == 1:
            return build_denoiser(1, self.signal_denoising_triangular_width,
                                  self.signal_denoising_triangular_mode)
        if self.signal_denoising == 2:
            return build_denoiser(2, self.signal_denoising_gaussian_width,
                                  self.signal_denoising_gaussian_mode)
        if self.signal_denoising == 3:
            return build_denoiser(3, self.signal_denoising_mb_width,
                                  self.signal_denoising_mb_mode)
        return None, 0

    def replace(self, **kwargs) -> "RadarModelConfig":
        return dataclasses.replace(self, **kwargs)

    @staticmethod
    def from_dict(d: dict) -> "RadarModelConfig":
        """Build from a flat dict of cfg names (preset YAML loader)."""
        fields = {f.name for f in dataclasses.fields(RadarModelConfig)}
        known = {k: v for k, v in d.items() if k in fields}
        return RadarModelConfig(**known)


def default_params(scene_n_objects: int = 1) -> Tuple[RadarParams, RadarModelConfig]:
    """Compiled-in defaults of ros_helper.h:21-35: beam 8 deg, 200 samples,
    2 reflections, air-only material table."""
    params = RadarParams.make(
        Materials.air_only(),
        np.zeros(max(scene_n_objects, 1), np.int32),
        beam_width_deg=8.0,
    )
    cfg = RadarModelConfig(n_samples=200, n_reflections=2)
    return params, cfg
