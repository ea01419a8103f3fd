"""Trace-engine and frame microbenchmarks on the current JAX backend.

Usage:
  python benchmarks/engines.py [--tris 10000] [--rays 160000] [--frames 10]

Times each trace engine on a raw ray batch (the hot op), then the full
jitted frame (bench.py's KAIST-preset workload) per engine. Prints one JSON
line per measurement; the last line is a summary. Complements bench.py
(which reports the single headline number the driver records).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def median_time(fn, n=5):
    """fn(i) MUST fetch data (host round-trip) — through the remote TPU
    relay, block_until_ready() does not reliably fence execution and
    dispatch-only loops over-report by >10x (see CLAUDE.md)."""
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(i)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def saturated_trace(sa, n_rays: int, coherent: bool, seed: int = 0,
                    two_phase_cap=None):
    """pallas3 Mrays/s at saturation (BASELINE.md's companion metric).

    Large ray counts make on-device time dominate the relay round-trip
    (standalone small-batch timings over-count by ~50-100 ms/fetch).
    coherent = azimuth-major radar fan; incoherent = random directions
    from random origins (worst case for block-level culling).
    """
    import jax
    import jax.numpy as jnp

    from radarays_ros_tpu.trace.api import trace

    rng = np.random.default_rng(seed)
    if coherent:
        A = 400
        S = n_rays // A
        az = np.repeat(np.linspace(0, 2 * np.pi, A, endpoint=False), S)
        el = np.tile(rng.normal(0, 0.06, S), A)
        d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                      np.sin(el)], -1).astype(np.float32)
        o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), d.shape)
    else:
        d = rng.normal(size=(n_rays, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        # scene bounds EXCLUDING the far-away padding chunks (1e9 boxes)
        his = np.asarray(sa.chunk_aabb_hi)
        real = his[:, 0] < 1e7
        lo = np.asarray(sa.chunk_aabb_lo)[real].min(0)
        hi = his[real].max(0)
        o = lo + rng.uniform(0.1, 0.9, size=(n_rays, 3)) * (hi - lo)
    o_j = jnp.asarray(o, jnp.float32)
    d_j = jnp.asarray(d, jnp.float32)

    @jax.jit
    def run(sa, dd):
        # incoherent rays need the spatial ray sort: the culled sweep's
        # efficiency rests on intra-block coherence (trace/pallas_trace.py).
        # NOTE: the scene is an ARGUMENT, not a closure — closed-over scene
        # tables get inlined into the compile payload (hundreds of MB).
        r = trace(sa, o_j, dd, engine="pallas3", ray_block=2048,
                  sort_rays=not coherent, two_phase_cap=two_phase_cap)
        return jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0)), \
            jnp.mean(r.hit.astype(jnp.float32))

    _, hr = run(sa, d_j)
    hr = float(hr)
    dt = median_time(lambda i: float(run(sa, d_j * (1.0 + 1e-6 * (i + 1)))[0]),
                     n=3)
    return len(d) / dt / 1e6, dt, hr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buildings", type=int, default=800)
    ap.add_argument("--rays", type=int, default=160_000)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--chunk-size", type=int, default=256)
    ap.add_argument("--engines", default="mxu,culled,pallas3")
    ap.add_argument("--saturated", action="store_true",
                    help="only run the saturated pallas3 Mrays/s suite "
                         "(0.5M and 1M rays, coherent + incoherent)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene
    from radarays_ros_tpu.trace.api import trace

    parts, names = make_urban_scene(
        n_buildings=args.buildings, extent=300.0, seed=7)
    scene = Scene.compose(parts, names, chunk_size=args.chunk_size)
    sa = jax.device_put(scene.device_arrays())
    print(json.dumps({"device": str(jax.devices()[0]),
                      "n_triangles": scene.n_triangles,
                      "n_chunks": sa.chunk_aabb_lo.shape[0]}))

    if args.saturated:
        # single calls beyond ~1M rays exceed HBM on one v5e; 1M saturates
        # (device time ~0.5 s >> the ~50 ms relay fetch)
        for n_rays in (524_288, 1_048_576):
            for coherent, cap in ((True, None), (False, None),
                                  (False, 75.0)):
                mrays, dt, hr = saturated_trace(sa, n_rays, coherent,
                                                two_phase_cap=cap)
                print(json.dumps({
                    "bench": "saturated_trace", "engine": "pallas3",
                    "rays": n_rays,
                    "mode": "coherent" if coherent else "incoherent",
                    **({"two_phase_cap": cap} if cap else {}),
                    "mrays_per_sec": round(mrays, 2),
                    "ms": round(dt * 1e3, 1), "hit_rate": round(hr, 4)}))
        return

    rng = np.random.default_rng(0)
    # radar-like rays: azimuth-major coherent fan from a central sensor
    A = 400
    S = args.rays // A
    az = np.repeat(np.linspace(0, 2 * np.pi, A, endpoint=False), S)
    el = np.tile(rng.normal(0, 0.03, S), A)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1).astype(np.float32)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), d.shape).copy()
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    results = {}
    for engine in args.engines.split(","):
        kw = {"ray_block": 2048}

        @jax.jit
        def run(sa, dd, engine=engine, kw=kw):
            r = trace(sa, o_j, dd, engine=engine, **kw)
            return jnp.sum(r.hit), jnp.mean(r.hit.astype(jnp.float32))

        try:
            _, hit_rate = run(sa, d_j)
            hit_rate = float(hit_rate)
            dt = median_time(
                lambda i: int(run(sa, d_j * (1.0 + 1e-6 * (i + 1)))[0]))
            mrays = args.rays / dt / 1e6
            results[engine] = mrays
            print(json.dumps({"bench": "trace", "engine": engine,
                              "mrays_per_sec": round(mrays, 2),
                              "ms": round(dt * 1e3, 3),
                              "hit_rate": round(hit_rate, 4)}))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"bench": "trace", "engine": engine,
                              "error": str(e)[:200]}))

    # full-frame benchmark per engine (KAIST preset geometry)
    from radarays_ros_tpu.sim.config import Materials, RadarModelConfig, RadarParams
    from radarays_ros_tpu.sim.pipeline import simulate_frame_jit
    from radarays_ros_tpu.utils.transforms import make_pose

    materials = Materials.from_list(
        [dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0),
         dict(velocity=0.0, ambient=1.0, diffuse=0.0, specular=3000.0)])
    params = jax.device_put(RadarParams.make(
        materials, np.ones(scene.n_objects, np.int32), beam_width_deg=10.0))
    pose = jnp.asarray(make_pose([0.0, 0.0, 2.0]))
    key = jax.random.PRNGKey(0)

    frame = {}
    for engine in args.engines.split(","):
        cfg = RadarModelConfig(
            n_angles=400, n_cells=3424, resolution=0.0595238, n_samples=50,
            n_reflections=4, beam_sample_dist=2, energy_max=0.72,
            signal_max=110.0, signal_denoising=1,
            signal_denoising_triangular_width=35,
            signal_denoising_triangular_mode=0.35, ambient_noise=2,
            record_multi_reflection=True, trace_engine=engine,
            trace_ray_block=2048)
        try:
            @jax.jit
            def frame_sum(sa, k):
                return jnp.sum(
                    simulate_frame_jit(sa, params, cfg, pose, k
                                       ).image_u8.astype(jnp.int32))

            int(frame_sum(sa, key))
            dt = median_time(
                lambda i: int(frame_sum(sa, jax.random.fold_in(key, i + 1))),
                n=args.frames)
            frame[engine] = 1.0 / dt
            print(json.dumps({"bench": "frame", "engine": engine,
                              "hz": round(1.0 / dt, 2),
                              "ms": round(dt * 1e3, 1)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"bench": "frame", "engine": engine,
                              "error": str(e)[:200]}))

    print(json.dumps({"summary": {"trace_mrays": results, "frame_hz": frame}}))


if __name__ == "__main__":
    main()
