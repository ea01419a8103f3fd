"""A/B of chunk-ordering variants: median split vs SAH-scored split.

The sweep kernel is ~72% of frame device time (benchmarks/
profile_frame.py, round 5) and its cost is (visited chunks) x chunk_size
lanes per ray block; chunk-AABB quality therefore multiplies throughput
directly (round 2: median-split took a representative block from 110
overlapped chunks to 11). This harness scores the next step — a full
SAH sweep over all 3 axes x all chunk_size-snapped split positions
(geom/scene.py:_median_split_order_sah) — in two stages:

  1. --proxy (CPU, no TPU): build the bench scene under both orderings
     and count, for a representative radar fan, how many chunk AABBs
     each ray's slab test overlaps within t_max. This proxies the
     sweep's visit count (the prep entry/ranking uses the same slab
     test) without any device time.
  2. hardware stages (same protocol as argmin_ab.py): parity gate,
     chained-marginal standalone trace, frame bench, under
     RADARAYS_ORDER_VARIANT=sah vs default.

Usage: python -u benchmarks/order_ab.py --proxy [--buildings 83000]
       python -u benchmarks/order_ab.py --hw [--skip-frame] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fan(n_rays: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    A = 400
    S = n_rays // A
    az = np.repeat(np.linspace(0, 2 * np.pi, A, endpoint=False), S)
    el = np.tile(rng.normal(0, 0.06, S), A)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1).astype(np.float32)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), d.shape)
    return o.copy(), d


def overlap_stats(lo: np.ndarray, hi: np.ndarray, o: np.ndarray,
                  d: np.ndarray, t_max: float) -> dict:
    """Per-ray count of chunk AABBs the slab test keeps within t_max.

    Same math as trace/pallas_trace.py:_slab_keep — the proxy for both
    the prep's kept set and the sweep's visit candidates."""
    idv = np.where(d != 0.0, 1.0 / d, np.inf).astype(np.float32)
    n_rays = o.shape[0]
    counts = np.zeros(n_rays, np.int64)
    entry_sum = 0.0
    B = 512
    for i in range(0, n_rays, B):
        ob, ib = o[i:i + B], idv[i:i + B]
        t0 = (lo[None, :, :] - ob[:, None, :]) * ib[:, None, :]
        t1 = (hi[None, :, :] - ob[:, None, :]) * ib[:, None, :]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        tn0 = np.maximum(tn, 0.0)
        keep = (tf >= tn0) & (tn <= t_max)
        counts[i:i + B] = keep.sum(axis=1)
        entry_sum += float(np.where(keep, tn0, 0.0).sum())
    return {
        "mean_overlaps_per_ray": round(float(counts.mean()), 2),
        "p90_overlaps": int(np.percentile(counts, 90)),
        "max_overlaps": int(counts.max()),
        "total_overlaps": int(counts.sum()),
    }


def build_arrays(n_buildings: int, variant: str):
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene

    parts, names = make_urban_scene(n_buildings=n_buildings, extent=300.0,
                                    seed=7)
    scene = Scene.compose(parts, names, chunk_size=256)
    os.environ["RADARAYS_ORDER_VARIANT"] = variant
    try:
        t0 = time.perf_counter()
        sa = scene.device_arrays()
        dt = time.perf_counter() - t0
    finally:
        os.environ.pop("RADARAYS_ORDER_VARIANT", None)
    return sa, dt


def chunk_sa_sum(lo: np.ndarray, hi: np.ndarray) -> float:
    d = hi - lo
    return float((d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                  + d[:, 2] * d[:, 0]).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proxy", action="store_true")
    ap.add_argument("--hw", action="store_true")
    ap.add_argument("--buildings", type=int, default=83000)
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--t-max", type=float, default=203.8)
    ap.add_argument("--variants", default="median,sah")
    ap.add_argument("--skip-frame", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    variants = args.variants.split(",")

    if args.proxy:
        o, d = fan(args.rays)
        for variant in variants:
            sa, dt = build_arrays(args.buildings, variant)
            lo = np.asarray(sa.chunk_aabb_lo)
            hi = np.asarray(sa.chunk_aabb_hi)
            st = overlap_stats(lo, hi, o, d, args.t_max)
            print(json.dumps({
                "stage": "proxy", "variant": variant,
                "n_chunks": int(lo.shape[0]),
                "build_s": round(dt, 1),
                "chunk_sa_sum": round(chunk_sa_sum(lo, hi), 1),
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
        for variant in variants:
            os.environ["RADARAYS_ORDER_VARIANT"] = variant
            try:
                if not args.skip_parity:
                    par = parity_check()
                    print(json.dumps({"stage": "parity", "variant": variant,
                                      **par}), flush=True)
                scene, _p, _c, _k = build_benchmark(args.buildings)
                scene = jax.device_put(scene)
                m = trace_marginal("gated", scene)
                print(json.dumps({"stage": "marginal", "variant": variant,
                                  **m}), flush=True)
                del scene
                if not args.skip_frame:
                    s, b, t, tris, _ = measure_scale(
                        n_buildings=args.buildings)
                    print(json.dumps(
                        {"stage": "frame_1m", "variant": variant,
                         "sustained_hz": round(s, 2),
                         "best_hz": round(b, 2),
                         "trimmed_median_hz": round(t, 2),
                         "n_triangles": tris}), flush=True)
            finally:
                os.environ.pop("RADARAYS_ORDER_VARIANT", None)


if __name__ == "__main__":
    main()
