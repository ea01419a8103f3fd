"""Headline benchmark: full rotating-radar frames/sec on real TPU hardware.

Workload = the reference's tuned MulRan KAIST02 preset
(cfg/mulran_kaist_dyncfg.yaml): 400 azimuths x 3424 range cells, resolution
0.0595238 m, 50 samples/beam, 4 reflections, triangular denoise (35, 0.35),
Perlin ambient noise — at THREE scene scales:

  * ~1M triangles (procedural urban; the KAIST02 mesh's workload class,
    launch/mulran_sim.launch:7) — the HEADLINE metric;
  * ~10k triangles (the round-1 scene) — regression companion;
  * ~10M triangles (10x flagship) — scale companion.

North star (BASELINE.json): >= 4 Hz on one TPU v5e chip at the flagship
workload.

Prints ONE JSON line on stdout — IMMEDIATELY after the headline (1M-scale)
measurement, so a driver wall-clock timeout during the companion scales
cannot lose the round's number (round 3 shipped rc=124/no JSON exactly that
way). Companion results go to stderr and BENCH_DETAILS.json. Scene-table
builds use the native helper (built here if missing) and the on-disk scene
cache (geom/cache.py), cutting host-side prep from NumPy-minutes to
seconds on reruns.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_native() -> bool:
    """Build the native scene builder if missing (graceful fallback)."""
    from radarays_ros_tpu.native import builder

    if builder.available():
        return True
    root = pathlib.Path(__file__).parent / "radarays_ros_tpu" / "native"
    try:
        subprocess.run(["make", "-C", str(root)], check=True,
                       capture_output=True, timeout=120)
    except (subprocess.SubprocessError, OSError) as e:
        _log(f"bench: native build failed ({e}); NumPy fallback")
        return False
    builder.reset_probe()  # forget the cached failed probe, retry
    return builder.available()


def parity_check(n_buildings: int = 16600, n_rays: int = 131072,
                 chunk_size: int = 256, **trace_kwargs) -> dict:
    """Hardware exactness gate: pallas3 vs the exact `culled` oracle.

    Two consecutive rounds shipped kernels that were silently wrong ON
    HARDWARE ONLY (round 3: bf16 matmul truncation; round 4: XLA
    excess-precision elision of the traced split parts) while the entire
    CPU/interpret suite stayed green. This stage is the one guard that
    catches that class (CLAUDE.md), so it runs inside every bench and its
    verdict ships in the headline JSON. ~200k-triangle urban scene,
    131k-ray coherent radar fan, exact-match contract on hit/t/obj
    (tests/test_trace.py's engine contract, run on the real device).
    """
    import jax
    import jax.numpy as jnp

    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene
    from radarays_ros_tpu.trace.api import trace

    rng = np.random.default_rng(0)
    A = 400
    S = n_rays // A
    az = np.repeat(np.linspace(0, 2 * np.pi, A, endpoint=False), S)
    el = np.tile(rng.normal(0, 0.06, S), A)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1).astype(np.float32)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), d.shape).copy()

    parts, names = make_urban_scene(n_buildings=n_buildings, extent=140.0,
                                    seed=11)
    sa = jax.device_put(Scene.compose(parts, names,
                                      chunk_size=chunk_size).device_arrays())
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    @jax.jit
    def both(sa, o_j, d_j):
        # scene as ARGUMENT, not closure — closed-over tables get inlined
        # into the compile payload (hundreds of MB; the relay 413s)
        rp = trace(sa, o_j, d_j, engine="pallas3", ray_block=2048,
                   **trace_kwargs)
        rc = trace(sa, o_j, d_j, engine="culled", k_chunks=None)
        return (rp.hit, rp.t, rp.obj_id, rc.hit, rc.t, rc.obj_id)

    ph, pt, po, ch, ct, co = [np.asarray(x) for x in both(sa, o_j, d_j)]
    common = ph & ch
    hit_mm = int((ph != ch).sum())
    obj_mm = int((po[common] != co[common]).sum())
    max_dt = float(np.abs(pt[common] - ct[common]).max()) if common.any() \
        else 0.0
    return {
        "n_triangles": int(sa.verts.shape[0]),
        "n_rays": n_rays,
        "hit_rate": round(float(ph.mean()), 4),
        "hit_mismatches": hit_mm,
        "obj_mismatches_on_common_hits": obj_mm,
        "max_abs_dt_on_common_hits": max_dt,
        "exact": bool(hit_mm == 0 and obj_mm == 0 and max_dt == 0.0),
    }


def build_benchmark(n_buildings: int, extent: float = 300.0,
                    cfg_overrides: dict | None = None,
                    chunk_size: int = 256):
    import jax

    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene
    from radarays_ros_tpu.sim.config import Materials, RadarModelConfig, RadarParams

    t0 = time.perf_counter()
    parts, names = make_urban_scene(n_buildings=n_buildings, extent=extent,
                                    seed=7)
    scene = Scene.compose(parts, names, chunk_size=chunk_size)
    t1 = time.perf_counter()

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
        # trace_prep_group stays at its default 0 = auto-derived from the
        # chunk count (round 4; the 10M scale derives its required 4)
        draw_method="pallas",
        trace_aux_baked=True,  # material map baked below (sim/radar.py does
        #   the same); skips the per-jit-call (T,) gather + table copy
    )
    if cfg_overrides:
        cfg = cfg.replace(**cfg_overrides)
    key = jax.random.PRNGKey(0)
    from radarays_ros_tpu.geom.scene import bake_tri_aux

    sa = scene.device_arrays()   # native + disk cache (geom/cache.py)
    t2 = time.perf_counter()
    _log(f"bench: scene {scene.n_triangles} tris: gen {t1 - t0:.1f}s, "
         f"tables {t2 - t1:.1f}s")
    row = np.asarray(object_materials, np.float32)[
        np.clip(np.asarray(sa.obj_ids), 0, len(object_materials) - 1)]
    return bake_tri_aux(sa, row), params, cfg, key


def measure_scale(n_buildings: int, n_iters: int = 7, batch: int = 20,
                  extent: float = 300.0, n_stream: int = 10,
                  cfg_overrides: dict | None = None,
                  chunk_size: int = 256):
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
                                              cfg_overrides=cfg_overrides,
                                              chunk_size=chunk_size)
    scene = jax.device_put(scene)
    params = jax.device_put(params)
    pose = jnp.asarray(make_pose([0.0, 0.0, 2.0]))
    poses = jnp.tile(pose[None], (batch, 1))

    @jax.jit
    def run_batch(scene, params, poses, keys):
        res = simulate_frames_jit(scene, params, cfg, poses, keys)
        return jnp.sum(res.image_u8.astype(jnp.int32))

    keys = jax.random.split(key, batch)
    t0 = time.perf_counter()
    int(run_batch(scene, params, poses, keys))  # warmup/compile
    _log(f"bench: compile+warmup {time.perf_counter() - t0:.1f}s")

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
    if checksum == 0:
        _log("bench: WARNING all-zero checksum (unexpected for this scene)")
    streaming_hz = batch * n_stream / (time.perf_counter() - t0)

    return streaming_hz, best_hz, tmed_hz, int(scene.verts.shape[0]), cfg


def _pack(stream, best, tmed, tris):
    return {"sustained_hz": round(stream, 3), "best_hz": round(best, 3),
            "trimmed_median_hz": round(tmed, 3), "n_triangles": tris}


def main():
    import jax

    # persistent compile cache: first-compile latency through the remote
    # relay is minutes; later runs (including the driver's) reuse the cache
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    ensure_native()

    wall0 = time.perf_counter()
    # EXACTNESS GATE before anything is published: pallas3 vs the exact
    # oracle on the real device. This is the only check that catches
    # hardware-only numeric defects (two shipped in rounds 3-4); its
    # verdict rides inside the headline JSON so every BENCH_rN records it.
    try:
        par = parity_check()
        _log(f"bench: parity {json.dumps(par)}")
    except Exception as e:  # pragma: no cover - defensive for the driver
        par = {"error": str(e)[:300], "exact": False}
        _log(f"bench: parity stage FAILED: {e}")

    # HEADLINE next — nothing else may run before it that could eat the
    # driver's wall clock: the ~1M-triangle KAIST-scale scene
    big_stream, big_best, big_tmed, big_tris, cfg = measure_scale(
        n_buildings=83000)

    rays_per_frame = cfg.n_angles * cfg.n_samples * cfg.n_reflections
    headline = {
        "metric": "radar_frames_per_sec_400x3424_kaist_preset_1M_tris",
        "value": round(big_stream, 3),
        "unit": "Hz",
        "vs_baseline": round(big_stream / 4.0, 3),
        "parity": par,
        "extra": {
            "protocol": "sustained streaming throughput: 10 batches of 20 "
                        "frames dispatched back-to-back (varied inputs), "
                        "ALL checksums fetched at the end — every batch's "
                        "execution is forced; the relay round-trip "
                        "amortizes over the run (the free-run consumer "
                        "pattern). Fenced per-batch numbers alongside. "
                        "Companion scales (10k/10M tris) run AFTER this "
                        "line prints: see BENCH_DETAILS.json.",
            "fenced_best_hz": round(big_best, 3),
            "fenced_trimmed_median_hz": round(big_tmed, 3),
            "n_triangles": big_tris,
            "mrays_per_sec": round(big_stream * rays_per_frame / 1e6, 2),
            "rays_per_frame": rays_per_frame,
            "device": str(jax.devices()[0]),
            "trace_engine": cfg.trace_engine,
            "batch": 20,
        },
    }
    # THE one stdout JSON line, flushed before the companion scales run
    print(json.dumps(headline), flush=True)

    # companion scales: best-effort within the remaining wall clock;
    # results recorded for the docs, never allowed to cost the headline
    details = {"headline": headline}
    budget_s = float(os.environ.get("RADARAYS_BENCH_BUDGET_S", "2400"))
    for name, kwargs in (
            ("small_10k", dict(n_buildings=800)),
            ("huge_10m", dict(n_buildings=830000, extent=950.0))):
        elapsed = time.perf_counter() - wall0
        if elapsed > budget_s:
            details[name] = {"skipped": f"wall budget ({elapsed:.0f}s "
                                        f"> {budget_s:.0f}s)"}
            _log(f"bench: skipping {name}: over wall budget")
            continue
        try:
            s, b, t, tris, _ = measure_scale(**kwargs)
            details[name] = _pack(s, b, t, tris)
            _log(f"bench: {name}: {json.dumps(details[name])}")
        except Exception as e:  # pragma: no cover - defensive for the driver
            details[name] = {"error": str(e)[:300]}
            _log(f"bench: {name} FAILED: {e}")

    out = pathlib.Path(__file__).parent / "BENCH_DETAILS.json"
    out.write_text(json.dumps(details, indent=2) + "\n")
    _log(f"bench: details written to {out}")


if __name__ == "__main__":
    main()
