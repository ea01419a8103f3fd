"""Headline benchmark: full rotating-radar frames/sec on real TPU hardware.

Workload = the reference's tuned MulRan KAIST02 preset
(cfg/mulran_kaist_dyncfg.yaml): 400 azimuths x 3424 range cells, resolution
0.0595238 m, 50 samples/beam, 4 reflections, triangular denoise (35, 0.35),
Perlin ambient noise — at TWO scene scales:

  * ~1M triangles (procedural urban; the KAIST02 mesh's workload class,
    launch/mulran_sim.launch:7) — the HEADLINE metric;
  * ~10k triangles (the round-1 scene) — regression companion.

North star (BASELINE.json): >= 4 Hz on one TPU v5e chip at the flagship
workload.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N, "extra": ...}
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_benchmark(n_buildings: int, extent: float = 300.0,
                    prep_group: int = 1):
    import jax

    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene
    from radarays_ros_tpu.sim.config import Materials, RadarModelConfig, RadarParams

    parts, names = make_urban_scene(n_buildings=n_buildings, extent=extent,
                                    seed=7)
    scene = Scene.compose(parts, names, chunk_size=256)

    n_obj = scene.n_objects
    materials = Materials.from_list(
        [dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0)]
        + [dict(velocity=0.0, ambient=1.0, diffuse=0.0, specular=3000.0)]
    )
    object_materials = np.ones(n_obj, np.int32)  # everything wall-stone
    params = RadarParams.make(materials, object_materials, beam_width_deg=10.0)

    cfg = RadarModelConfig(
        n_angles=400,
        n_cells=3424,
        resolution=0.0595238,
        n_samples=50,
        n_reflections=4,
        beam_sample_dist=2,
        beam_sample_dist_normal_p_in_cone=0.8,
        energy_max=0.72,
        signal_max=110.0,
        signal_denoising=1,
        signal_denoising_triangular_width=35,
        signal_denoising_triangular_mode=0.35,
        ambient_noise=2,
        ambient_noise_at_signal_0=0.1,
        ambient_noise_at_signal_1=0.03,
        ambient_noise_energy_max=0.1,
        ambient_noise_energy_min=0.05,
        record_multi_reflection=True,
        record_multi_path=False,
        opaque_materials=True,  # wall-stone velocity 0: refraction provably dead
        trace_engine="pallas3",
        trace_ray_block=2048,
        trace_prep_group=prep_group,
        draw_method="pallas",
        trace_aux_baked=True,  # material map baked below (sim/radar.py does
        #   the same); skips the per-jit-call (T,) gather + table copy
    )
    key = jax.random.PRNGKey(0)
    from radarays_ros_tpu.geom.scene import bake_tri_aux

    sa = scene.device_arrays()
    row = np.asarray(object_materials, np.float32)[
        np.clip(np.asarray(sa.obj_ids), 0, len(object_materials) - 1)]
    return bake_tri_aux(sa, row), params, cfg, key


def measure_scale(n_buildings: int, n_iters: int = 7, batch: int = 20,
                  extent: float = 300.0, prep_group: int = 1,
                  n_stream: int = 10):
    """Frame throughput at one scene scale, two fetch-forced protocols.

    NOTE on methodology: through the axon relay, block_until_ready() does
    NOT reliably fence device execution — timing loops that only dispatch
    report fantasy numbers. Both protocols therefore FETCH scalar
    checksums of every frame batch, which forces real execution:

      * fenced: one fetch per timed batch (per-batch latency; the fetch
        round-trip, ~30 ms, is inside every measurement). best = cleanest
        single-batch estimate; trimmed median = robust companion.
      * streaming (the production free-run pattern): dispatch n_stream
        batches back-to-back with varied inputs (relay dedup needs
        identical dispatches), then fetch ALL checksums — the device
        executes contiguously and the round-trip amortizes over the run.
        This is the sustained frames/sec a consumer draining the
        simulator sees, and the headline metric.

    Returns (streaming_hz, best_hz, trimmed_median_hz, n_triangles, cfg).
    """
    import jax
    import jax.numpy as jnp

    from radarays_ros_tpu.sim.pipeline import simulate_frames_jit
    from radarays_ros_tpu.utils.transforms import make_pose

    scene, params, cfg, key = build_benchmark(n_buildings, extent=extent,
                                              prep_group=prep_group)
    scene = jax.device_put(scene)
    params = jax.device_put(params)
    pose = jnp.asarray(make_pose([0.0, 0.0, 2.0]))
    poses = jnp.tile(pose[None], (batch, 1))

    @jax.jit
    def run_batch(scene, params, poses, keys):
        res = simulate_frames_jit(scene, params, cfg, poses, keys)
        return jnp.sum(res.image_u8.astype(jnp.int32))

    keys = jax.random.split(key, batch)
    int(run_batch(scene, params, poses, keys))  # warmup/compile

    times = []
    for i in range(n_iters):
        kb = jax.random.split(jax.random.fold_in(key, i + 1), batch)
        t0 = time.perf_counter()
        int(run_batch(scene, params, poses, kb))  # fetch -> hard fence
        times.append(time.perf_counter() - t0)
    times.sort()
    best_hz = batch / times[0]
    trimmed = times[1:-1] if len(times) > 2 else times
    tmed_hz = batch / float(np.median(trimmed))

    # streaming: dispatch-ahead, then force everything with the fetches
    t0 = time.perf_counter()
    outs = []
    for i in range(n_stream):
        kb = jax.random.split(jax.random.fold_in(key, 1000 + i), batch)
        outs.append(run_batch(scene, params, poses, kb))
    checksum = sum(int(o) for o in outs)  # fetch all -> every batch ran
    assert checksum != 0
    streaming_hz = batch * n_stream / (time.perf_counter() - t0)

    return streaming_hz, best_hz, tmed_hz, int(scene.verts.shape[0]), cfg


def main():
    import pathlib

    import jax

    # persistent compile cache: first-compile latency through the remote
    # relay is minutes; later runs (including the driver's) reuse the cache
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # headline: the ~1M-triangle KAIST-scale scene
    big_stream, big_best, big_tmed, big_tris, cfg = measure_scale(
        n_buildings=83000)
    # companion: the ~10k-triangle round-1 scene (regression guard)
    small_stream, small_best, small_tmed, small_tris, _ = measure_scale(
        n_buildings=800)
    # companion: 10x the flagship scale (~10M triangles; prep_group=4 keeps
    # the chunk-entry table inside the kernel VMEM scope). Guarded: a
    # failure here must not take down the headline measurement.
    try:
        huge_stream, huge_best, huge_tmed, huge_tris, _ = measure_scale(
            n_buildings=830000, extent=950.0, prep_group=4)
        huge = {"sustained_hz": round(huge_stream, 3),
                "best_hz": round(huge_best, 3),
                "trimmed_median_hz": round(huge_tmed, 3),
                "n_triangles": huge_tris}
    except Exception as e:  # pragma: no cover - defensive for the driver
        huge = {"error": str(e)[:200]}

    rays_per_frame = cfg.n_angles * cfg.n_samples * cfg.n_reflections
    print(json.dumps({
        "metric": "radar_frames_per_sec_400x3424_kaist_preset_1M_tris",
        "value": round(big_stream, 3),
        "unit": "Hz",
        "vs_baseline": round(big_stream / 4.0, 3),
        "extra": {
            "protocol": "sustained streaming throughput: 10 batches of 20 "
                        "frames dispatched back-to-back (varied inputs), "
                        "ALL checksums fetched at the end — every batch's "
                        "execution is forced; the relay round-trip "
                        "amortizes over the run (the free-run consumer "
                        "pattern). Fenced per-batch numbers alongside.",
            "fenced_best_hz": round(big_best, 3),
            "fenced_trimmed_median_hz": round(big_tmed, 3),
            "n_triangles": big_tris,
            "small_scene": {
                "sustained_hz": round(small_stream, 3),
                "best_hz": round(small_best, 3),
                "trimmed_median_hz": round(small_tmed, 3),
                "n_triangles": small_tris,
            },
            "scale_10m": huge,
            "mrays_per_sec": round(big_stream * rays_per_frame / 1e6, 2),
            "rays_per_frame": rays_per_frame,
            "device": str(jax.devices()[0]),
            "trace_engine": cfg.trace_engine,
            "batch": 20,
        },
    }))


if __name__ == "__main__":
    main()
