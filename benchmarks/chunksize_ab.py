"""A/B of the trace chunk size (triangles per chunk) under SAH ordering.

chunk_size trades three costs against each other:

  * sweep lanes tested  = (visited chunks) x chunk_size per ray block —
    finer chunks have tighter AABBs (fewer wasted lanes) but more of
    them overlap the beam cone;
  * per-visit fixed cost — DMA setup + the gated argmin's
    vector->scalar sync + while-loop scalars are paid PER VISIT, so
    halving chunk_size roughly doubles them;
  * prep cost — the hierarchical culling prep tests every chunk AABB
    against every ray tile, so it scales with the chunk count.

256 was tuned under the round-2 median-split ordering; SAH (round 5)
changed the AABB-quality curve, so re-score the grid. The kernel
constraint is chunk_size % 128 == 0 (slab width 5*Tc must align to the
128-lane dim), giving the candidate grid 128/256/384/512.

Stages (same protocol as order_ab.py):
  --proxy (CPU): per-ray slab-kept chunk counts -> predicted total
    lanes tested + chunk-count prep proxy, per candidate size.
  --hw: parity gate, chained-marginal trace, frame bench per size.

Usage: python -u benchmarks/chunksize_ab.py --proxy [--buildings 83000]
       python -u benchmarks/chunksize_ab.py --hw --sizes 128,256
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from order_ab import chunk_sa_sum, fan, overlap_stats  # noqa: E402


def build_arrays(n_buildings: int, chunk_size: int):
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene

    parts, names = make_urban_scene(n_buildings=n_buildings, extent=300.0,
                                    seed=7)
    scene = Scene.compose(parts, names, chunk_size=chunk_size)
    t0 = time.perf_counter()
    sa = scene.device_arrays()
    return sa, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proxy", action="store_true")
    ap.add_argument("--hw", action="store_true")
    ap.add_argument("--buildings", type=int, default=83000)
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--t-max", type=float, default=203.8)
    ap.add_argument("--sizes", default="128,256,384,512")
    ap.add_argument("--skip-frame", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    if args.proxy:
        o, d = fan(args.rays)
        for tc in sizes:
            sa, dt = build_arrays(args.buildings, tc)
            lo = np.asarray(sa.chunk_aabb_lo)
            hi = np.asarray(sa.chunk_aabb_hi)
            st = overlap_stats(lo, hi, o, d, args.t_max)
            print(json.dumps({
                "stage": "proxy", "chunk_size": tc,
                "n_chunks": int(lo.shape[0]),
                "build_s": round(dt, 1),
                "chunk_sa_sum": round(chunk_sa_sum(lo, hi), 1),
                "total_lanes_m": round(st["total_overlaps"] * tc / 1e6, 2),
                **st}), flush=True)

    if args.hw:
        import pathlib

        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        print(json.dumps({"stage": "env", "device": str(jax.devices()[0])}),
              flush=True)

        from argmin_ab import trace_marginal

        from bench import build_benchmark, ensure_native, measure_scale, \
            parity_check

        ensure_native()
        for tc in sizes:
            if not args.skip_parity:
                par = parity_check(chunk_size=tc)
                print(json.dumps({"stage": "parity", "chunk_size": tc,
                                  **par}), flush=True)
            scene, _p, _c, _k = build_benchmark(args.buildings,
                                                chunk_size=tc)
            scene = jax.device_put(scene)
            m = trace_marginal("gated", scene)
            print(json.dumps({"stage": "marginal", "chunk_size": tc,
                              **m}), flush=True)
            del scene
            if not args.skip_frame:
                s, b, t, tris, _ = measure_scale(n_buildings=args.buildings,
                                                 chunk_size=tc)
                print(json.dumps(
                    {"stage": "frame_1m", "chunk_size": tc,
                     "sustained_hz": round(s, 2),
                     "best_hz": round(b, 2),
                     "trimmed_median_hz": round(t, 2),
                     "n_triangles": tris}), flush=True)


if __name__ == "__main__":
    main()
